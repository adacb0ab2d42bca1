"""Scale demonstration: k-NN graph over a large synthetic string set.

The reference tops out at 1600 strings (its headline benchmark); the
BASELINE scale-up config targets 100k strings with anchor columns and
pair batches sharded over a v5e-8 pod slice.  This script builds the
graph for a configurable n on whatever devices are visible (one chip
works; with >1 device the engines shard automatically) and prints one
JSON line per run.

    python benchmarks/scale_strings.py --n 20000 --length 400

Exact-graph validation is only feasible for modest n (the oracle is
O(n^2) C-extension calls), so accuracy is reported on a sampled subset
of rows: for `--check-rows r` random points the true k-NN row is
computed exactly and compared.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/annchor_tpu_xla_cache")
# runnable as `python benchmarks/scale_strings.py` without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--length", type=int, default=400)
    ap.add_argument("--clusters", type=int, default=32)
    # at 0.25 (the small-set default) intra-cluster distances (~2*r*L)
    # run into the random-string background (~0.55*L) and the set has
    # no recoverable structure; 0.1 matches the bundled real set's
    # cluster separation
    ap.add_argument("--mutation-rate", type=float, default=0.1)
    ap.add_argument("--k", type=int, default=15)
    ap.add_argument("--p-work", type=float, default=0.01)
    ap.add_argument("--n-anchors", type=int, default=48)
    ap.add_argument("--n-samples", type=int, default=10000)
    # at scale the locality filter must be selective or the candidate
    # pair set explodes (the reference docs tune the same knobs)
    ap.add_argument("--loc-thresh", type=int, default=2)
    ap.add_argument("--check-rows", type=int, default=50)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    import annchor_tpu as at
    from annchor_tpu.datasets import make_strings

    X, y = make_strings(
        n=args.n,
        n_clusters=args.clusters,
        length=args.length,
        mutation_rate=args.mutation_rate,
        seed=args.seed,
    )
    X = list(X)

    ann = at.Annchor(
        X,
        "levenshtein",
        n_anchors=args.n_anchors,
        n_neighbors=args.k,
        n_samples=args.n_samples,
        p_work=args.p_work,
        loc_thresh=args.loc_thresh,
        random_seed=args.seed,
        verbose=True,
    )
    t0 = time.perf_counter()
    ann.fit()
    build_s = time.perf_counter() - t0

    # sampled exact-recall check
    rng = np.random.default_rng(0)
    rows = rng.choice(args.n, size=min(args.check_rows, args.n),
                      replace=False)
    from annchor_tpu.metrics import get_function_from_input

    metric = get_function_from_input("levenshtein", None)
    hits, total = 0, 0
    for r in rows:
        IJ = np.stack(
            [np.full(args.n, r, dtype=np.int64), np.arange(args.n)], axis=1
        )
        d = metric.batch(X, X, IJ)
        d[r] = np.inf
        exact = set(np.argsort(d, kind="stable")[: args.k - 1].tolist())
        got = set(np.asarray(ann.neighbor_graph[0])[r, 1: args.k].tolist())
        hits += len(exact & got)
        total += args.k - 1

    result = {
        "metric": "scale_strings_build_s",
        "value": round(build_s, 2),
        "unit": "s",
        "n": args.n,
        "length": args.length,
        "k": args.k,
        "p_work": args.p_work,
        "evals": int(ann.evals),
        "pairs_tracked": int(ann.IJs.shape[0]),
        "sampled_recall": round(hits / total, 4),
        "check_rows": len(rows),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
