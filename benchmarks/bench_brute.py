"""BruteForce parity rows: the reference publishes exact brute-force
baselines (strings-1600 Levenshtein 173.302 s, doc/user_guide.rst:387-388;
digits-1797 Wasserstein 108.233 s, :136-137) built over joblib processes.
This framework's BruteForce rides the same batched device engines as the
fit, so the exact graph itself is a benchmark row.

Protocol: one small warm-up batch primes the compile cache (the
reference likewise excludes numba JIT), then the full upper-triangle
build is timed.  Exactness is asserted against an Annchor fit's
0-error contract (strings) by comparing the graphs.

Appends one JSON line per dataset to benchmarks/results/tpu_session.jsonl.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results",
    "tpu_session.jsonl",
)


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as fh:
        fh.write(line + "\n")


def bench_strings():
    import jax

    import annchor_tpu as at
    from annchor_tpu.datasets import load_strings

    data = load_strings()
    X = data["X"]
    t0 = time.time()
    bf = at.BruteForce(X, "levenshtein")  # ctor smoke test warms compile
    # one representative batch to finish priming the chunk-size cache
    iu = np.stack(np.triu_indices(64, k=1), axis=1)
    bf.get_exact_ijs(bf.f, X, iu)
    warm = time.time() - t0

    t0 = time.time()
    bf.fit()
    wall = time.time() - t0

    # exactness cross-check vs the dataset's cached exact ground truth
    err = at.compare_neighbor_graphs(
        bf.neighbor_graph, data["neighbor_graph"], 25
    )
    emit({
        "metric": "bruteforce_strings_1600_s",
        "value": round(wall, 3), "unit": "s",
        "device": jax.devices()[0].device_kind,
        "warmup_s": round(warm, 2),
        "pairs": int(len(X) * (len(X) - 1) // 2),
        "errors_vs_exact_gt": int(err),
        "vs_baseline": round(wall / 173.302, 4),
    })


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--strings", action="store_true")
    args = ap.parse_args()
    if args.strings:
        bench_strings()
    else:
        ap.error("pick a dataset: --strings")


if __name__ == "__main__":
    main()
