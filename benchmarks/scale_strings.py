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
    # per-branch mutation rate of the evolve-mode phylogeny: parent
    # distance ~2*r*L (=8 at the defaults), so k-NN are close
    # relatives and the distance structure is graded like real string
    # corpora (star-topology clusters put all ~n/clusters members in
    # one flat band, which no sub-exhaustive method can rank)
    ap.add_argument("--mutation-rate", type=float, default=0.01)
    ap.add_argument("--k", type=int, default=15)
    ap.add_argument("--p-work", type=float, default=0.01)
    ap.add_argument("--n-anchors", type=int, default=48)
    ap.add_argument("--n-samples", type=int, default=10000)
    # at scale the locality filter must be selective or the candidate
    # pair set explodes (the reference docs tune the same knobs)
    ap.add_argument("--loc-thresh", type=int, default=2)
    ap.add_argument("--locality", type=int, default=5)
    # the reference CI uses niters=4 for its string workload
    # (/root/reference/annchor/tests/test_annchor.py:71-102); more
    # iterations re-target the eval budget as the error model improves
    ap.add_argument("--niters", type=int, default=2)
    ap.add_argument("--check-rows", type=int, default=50)
    # full-population check: exact GT graph via blocked device
    # columns + compare_neighbor_graphs over EVERY row (the
    # reference's own accuracy contract,
    # /root/reference/annchor/tests/test_annchor.py:95-102).
    # Feasible to ~100k; the GT is cached per corpus in /tmp.
    ap.add_argument("--exact-gt", action="store_true")
    # per-point pair budget (constructor kwarg; 0 = derived default)
    ap.add_argument("--pair-cap", type=int, default=0)
    # out-of-sample query check: hold out this many strings from the
    # generated corpus, query them against the fitted index, score
    # against exact query rows
    ap.add_argument("--query-check", type=int, default=0)
    ap.add_argument("--query-p-work", type=float, default=0.05)
    # persist the fitted index (format v2 on the scale path) and time
    # the save + a load that serves a query — the scale-safe
    # persistence evidence
    ap.add_argument("--save", type=str, default="")
    ap.add_argument("--seed", type=int, default=42)
    # warm-up fit first so the timed figure excludes XLA compilation,
    # matching the baseline protocol (reference excludes numba JIT)
    ap.add_argument("--warm", action="store_true")
    # post-fit graph-expansion refinement: extra exact-eval budget as
    # a fraction of the brute-force pair count (0 disables)
    ap.add_argument("--expand-evals", type=float, default=0.0)
    ap.add_argument("--expand-rounds", type=int, default=3)
    # same-total-budget variant: hold back this share of p_work for
    # the post-fit refinement instead of adding extra evals
    ap.add_argument("--refine-frac", type=float, default=0.0)
    # ctor-defaults row: ignore the tuned knobs and let the scale-aware
    # defaults (annchor.py) pick na/loc_thresh/niters/refine_frac —
    # the VERDICT r4 "defaults hit the frontier" verification
    ap.add_argument("--defaults", action="store_true")
    # budgeted-build cap-ranking score (linf | rms); rms = MXU matmul
    ap.add_argument("--build-score", type=str, default="")
    args = ap.parse_args(argv)

    import annchor_tpu as at
    from annchor_tpu.datasets import make_strings

    X, y = make_strings(
        n=args.n + args.query_check,
        n_clusters=args.clusters,
        length=args.length,
        mutation_rate=args.mutation_rate,
        seed=args.seed,
        evolve=True,
    )
    X = list(X)
    Q = X[args.n:]  # held-out queries (empty unless --query-check)
    X = X[: args.n]

    # exact check rows BEFORE the fit: the oracle only needs X, and at
    # nx >= 5e5 running it against a fully-resident fit state OOMs the
    # device (measured at 500k — the fit succeeded, the check crashed)
    rng = np.random.default_rng(0)
    rows = rng.choice(args.n, size=min(args.check_rows, args.n),
                      replace=False)
    # one-vs-all Myers state is (block, W, nx): at 10^6 columns a
    # 32-source block holds ~3.3 GB of PV/MV per buffer (measured
    # OOM); smaller source blocks trade dispatches for residency
    gt_block = 32 if args.n <= 500_000 else 8
    R = at.exact_rows(X, "levenshtein", rows=rows, block=gt_block)

    gt = None
    if args.exact_gt:
        # full-population GT likewise: exact graph via blocked device
        # columns + in-program top-k, cached per corpus
        gt_path = (
            f"/tmp/annchor_gt_{args.n}_{args.length}_{args.clusters}_"
            f"{args.mutation_rate}_{args.seed}_{args.k}"
            f"{'_q' + str(args.query_check) if args.query_check else ''}.npz"
        )
        t0 = time.perf_counter()
        if os.path.exists(gt_path):
            z = np.load(gt_path)
            gt = (z["idx"], z["dist"])
        else:
            gi, gd = at.exact_knn(
                X, "levenshtein", k=args.k, block=64, verbose=True
            )
            np.savez_compressed(gt_path, idx=gi, dist=gd)
            gt = (gi, gd)
        gt_s = time.perf_counter() - t0

    if args.build_score:
        os.environ["ANNCHOR_TPU_BUILD_SCORE"] = args.build_score

    def build(verbose):
        if args.defaults:
            ann = at.Annchor(
                X, "levenshtein", n_neighbors=args.k,
                p_work=args.p_work, random_seed=args.seed,
                verbose=verbose,
            )
        else:
            ann = at.Annchor(
                X,
                "levenshtein",
                n_anchors=args.n_anchors,
                n_neighbors=args.k,
                n_samples=args.n_samples,
                p_work=args.p_work,
                loc_thresh=args.loc_thresh,
                locality=args.locality,
                niters=args.niters,
                random_seed=args.seed,
                verbose=verbose,
                refine_frac=args.refine_frac,
                refine_rounds=args.expand_rounds,
                pair_cap=args.pair_cap or None,
            )
        t0 = time.perf_counter()
        ann.fit()
        return ann, time.perf_counter() - t0

    warm_s = None
    if args.warm:
        _, warm_s = build(verbose=False)
    ann, build_s = build(verbose=True)

    expand_s = 0.0
    if args.expand_evals > 0:
        # post-fit graph-expansion refinement: recover true edges the
        # pair budget / locality filter discarded, at a bounded extra
        # exact-eval cost (Annchor.refine_neighbor_graph)
        t0 = time.perf_counter()
        ann.refine_neighbor_graph(
            rounds=args.expand_rounds,
            budget=int(args.expand_evals * ann.N),
        )
        expand_s = time.perf_counter() - t0

    # sampled exact-recall check (R precomputed before the fit)
    # candidate coverage: true neighbors the locality filter admitted
    # as pairs at all (the recall ceiling; everything below it is the
    # regression/refinement ranking's miss, not the filter's)
    row_mask = np.zeros(args.n, dtype=bool)
    row_mask[rows] = True
    if getattr(ann, "_ij_dev", None) is not None:
        # device-resident pair list: filter on device, download only
        # the rows that touch the checked points
        import jax.numpy as jnp

        ij_i, ij_j, m_pairs = ann._ij_dev
        rm = jnp.asarray(row_mask)
        tm = jnp.take(rm, ij_i) | jnp.take(rm, ij_j)
        cnt = int(jnp.sum(tm))
        ids = jnp.flatnonzero(tm, size=cnt)
        IJt = np.stack(
            [np.asarray(jnp.take(ij_i, ids)),
             np.asarray(jnp.take(ij_j, ids))], axis=1,
        )
    else:
        IJs = np.asarray(ann.IJs)
        m_pairs = IJs.shape[0]
        touch = row_mask[IJs[:, 0]] | row_mask[IJs[:, 1]]
        IJt = IJs[touch]
    cand = {int(r): set() for r in rows}
    for i, j in IJt:
        if row_mask[i]:
            cand[int(i)].add(int(j))
        if row_mask[j]:
            cand[int(j)].add(int(i))

    hits, total, covered, d_hits = 0, 0, 0, 0
    for t, r in enumerate(rows):
        d = R[t].copy()
        d[r] = np.inf
        exact = set(np.argsort(d, kind="stable")[: args.k - 1].tolist())
        got = set(np.asarray(ann.neighbor_graph[0])[r, 1: args.k].tolist())
        hits += len(exact & got)
        covered += len(exact & cand[int(r)])
        total += args.k - 1
        # distance-multiset recall (the reference's own error
        # semantics, compare_neighbor_graphs): integer Levenshtein
        # creates tie groups straddling the k boundary — measured
        # 12.5% of true edges at 20k — and returning a different
        # EQUIDISTANT neighbor is not an error.  Both sides re-read
        # from the exact row d, so graph-carried values never enter.
        from collections import Counter

        diff = Counter(np.sort(d[sorted(exact)]).tolist()) - Counter(
            np.sort(d[sorted(got)]).tolist()
        )
        d_hits += (args.k - 1) - sum(diff.values())

    if args.exact_gt and gt is not None:
        # full-population error count in the reference's own metric
        # (GT computed/cached before the fit)
        errors = at.compare_neighbor_graphs(
            gt, ann.neighbor_graph, args.k
        )
    # the fit result is the headline — post-fit extras must not lose
    # it (a 75-minute 500k fit once died in the accuracy CHECK)
    qstats = None
    if args.query_check:
        try:
            _ = ann.query(Q[:8], nn=args.k, p_work=args.query_p_work)
            t0 = time.perf_counter()
            qg = ann.query(Q, nn=args.k, p_work=args.query_p_work)
            query_s = time.perf_counter() - t0
            rows_q = at.exact_query_rows(
                X, Q, "levenshtein", verbose=True
            )
            order = np.argsort(
                rows_q, axis=1, kind="stable"
            )[:, : args.k]
            gtd = np.take_along_axis(rows_q, order, axis=1)
            q_err = at.compare_neighbor_graphs(
                (order, gtd), qg, args.k
            )
            got = np.asarray(qg[0])[:, : args.k]
            hits_q = sum(
                len(set(order[t].tolist()) & set(got[t].tolist()))
                for t in range(len(Q))
            )
            qstats = {
                "nq": len(Q),
                "query_s": round(query_s, 2),
                "query_p_work": args.query_p_work,
                "query_recall": round(hits_q / (len(Q) * args.k), 4),
                "query_errors": int(q_err),
            }
        except Exception as err:  # noqa: BLE001
            print(f"query check failed: {err!r}")
            qstats = {"query_check_error": repr(err)[:200]}

    save_stats = None
    if args.save:
        try:
            t0 = time.perf_counter()
            ann.save(args.save)
            save_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            ann_l = at.Annchor.load(args.save, X, "levenshtein")
            load_s = time.perf_counter() - t0
            ok = bool(
                np.array_equal(
                    np.asarray(ann_l.neighbor_graph[0]),
                    np.asarray(ann.neighbor_graph[0]),
                )
            )
            save_stats = {
                "save_s": round(save_s, 2),
                "load_s": round(load_s, 2),
                "save_bytes": os.path.getsize(args.save),
                "load_graph_equal": ok,
            }
        except Exception as err:  # noqa: BLE001
            print(f"save/load check failed: {err!r}")
            save_stats = {"save_error": repr(err)[:200]}

    result = {
        "metric": "scale_strings_build_s",
        "value": round(build_s, 2),
        "unit": "s",
        "n": args.n,
        "length": args.length,
        "k": args.k,
        "p_work": args.p_work,
        "niters": args.niters,
        "evals": int(ann.evals),
        "pairs_tracked": int(m_pairs),
        "max_deg": int(np.asarray(ann.P_cnt).max()),
        "sampled_recall": round(hits / total, 4),
        "distance_recall": round(d_hits / total, 4),
        "candidate_coverage": round(covered / total, 4),
        "check_rows": len(rows),
    }
    if args.exact_gt:
        result["exact_gt_errors"] = int(errors)
        # reference error semantics: count per row of distinct
        # over-represented rounded distance values; normalise by rows
        result["exact_gt_error_rate"] = round(errors / args.n, 6)
        result["exact_gt_s"] = round(gt_s, 2)
    if qstats is not None:
        result.update(qstats)
    if save_stats is not None:
        result.update(save_stats)
    if args.pair_cap:
        result["pair_cap"] = args.pair_cap
    if warm_s is not None:
        result["warmup_s"] = round(warm_s, 2)
    if args.expand_evals > 0:
        result["expand_evals_frac"] = args.expand_evals
        result["expand_rounds"] = args.expand_rounds
        result["expand_s"] = round(expand_s, 2)
    if args.refine_frac > 0:
        result["refine_frac"] = args.refine_frac
    if args.defaults:
        result["defaults"] = True
        result["auto_n_anchors"] = int(ann.n_anchors)
        result["auto_loc_thresh"] = int(ann.loc_thresh)
        result["auto_niters"] = int(ann.niters)
        result["auto_refine_frac"] = float(ann.refine_frac)
    if args.build_score:
        result["build_score"] = args.build_score
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
