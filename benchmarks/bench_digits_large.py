"""Digits-5620 (digits_large) / exact-Wasserstein k-NN benchmark.

Reference numbers (BASELINE.md, reference doc/user_guide.rst:274-275):
ANNchor builds the k=25 graph of the full 5620-image UCI digits set at
p_work=0.1 in 105.233 s with 77 incorrect pairs (PyNNDescent: 225.9 s,
86 errors).  The original LFS data blob is not redistributable, so this
runs the same-scale synthetic stand-in from
``annchor_tpu.datasets.load_digits_large`` (augmented UCI test split,
exact-EMD ground truth regenerated with the native solver) — workload
class and budgets identical, images not bit-identical to upstream's.

Default configuration is the scout/certify hybrid (exp-domain Sinkhorn
exploration on the MXU, exact network-simplex certification); errors
are always counted against the exact ground truth.  Prints one JSON
line.  `--exact` runs the pure exact-metric configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/annchor_tpu_xla_cache")

BASELINE_S = 105.233  # reference doc/user_guide.rst:274
BASELINE_ERRORS = 77


def main(exact: bool = False):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import annchor_tpu as at
    from annchor_tpu.datasets import load_digits_large

    data = load_digits_large()
    X = data["X"]
    gt = data["neighbor_graph"]
    M = data["cost_matrix"]
    k = 25

    func_kwargs = {"cost_matrix": M}
    if not exact:
        func_kwargs["scout"] = "sinkhorn"

    # reference invocation (doc/user_guide.rst:262-270):
    # Annchor(X, wasserstein, n_anchors=30, n_neighbors=25, p_work=0.1)
    kwargs = dict(
        func="wasserstein",
        func_kwargs=func_kwargs,
        n_anchors=30,
        n_neighbors=k,
        p_work=0.1,
        random_seed=42,
    )

    pad = None
    for a in sys.argv[1:]:
        if a.startswith("--pad="):
            pad = int(a.split("=", 1)[1])

    def build():
        ann = at.Annchor(X, **kwargs)
        if pad is not None:
            ann.certify_pad = pad
        t0 = time.perf_counter()
        ann.fit()
        return ann, time.perf_counter() - t0

    _, warm_s = build()  # compile warm-up (numba JIT analogue)
    runs = [build() for _ in range(2)]
    dt = min(r[1] for r in runs)
    errors = max(
        at.compare_neighbor_graphs(r[0].neighbor_graph, gt, k)
        for r in runs
    )
    ann = runs[-1][0]

    result = {
        "metric": "digits5620_wasserstein_build_s",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": round(dt / BASELINE_S, 4),
        "errors": int(errors),
        "baseline_errors": BASELINE_ERRORS,
        "baseline_s": BASELINE_S,
        "warmup_s": round(warm_s, 3),
        "exact_evals": int(ann.evals),
        "scout_evals": int(ann.scout_evals),
        "mode": "exact" if exact else "sinkhorn_scout+exact_certify",
        "p_work": kwargs["p_work"],
        "n": len(X),
    }
    print(json.dumps(result))
    return 0 if errors <= BASELINE_ERRORS else 1


if __name__ == "__main__":
    sys.exit(main(exact="--exact" in sys.argv[1:]))
