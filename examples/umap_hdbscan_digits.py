"""UMAP + HDBSCAN over a Wasserstein k-NN graph (the reference's
flagship notebook workload: cluster 8x8 digit images under exact
optimal transport).

The ANNchor graph exports as a symmetrised sparse matrix that UMAP's
``metric="precomputed"`` accepts directly; HDBSCAN clusters the
embedding.  umap-learn / hdbscan are optional — without them the
script still builds the graph and reports 1-NN label purity.

    python examples/umap_hdbscan_digits.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import annchor_tpu as at
from annchor_tpu.datasets import load_digits


def main():
    data = load_digits()
    X, y, M = data["X"], data["y"], data["cost_matrix"]

    ann = at.Annchor(
        X,
        "wasserstein",
        func_kwargs={"cost_matrix": M},
        n_anchors=25,
        n_neighbors=25,
        n_samples=5000,
        p_work=0.16,
        verbose=True,
    )
    t0 = time.perf_counter()
    ann.fit()
    print(f"\nbuilt in {time.perf_counter() - t0:.1f}s "
          f"({ann.evals} exact EMD calls)")

    err = at.compare_neighbor_graphs(
        ann.neighbor_graph, data["neighbor_graph"], 25
    )
    print(f"incorrect NN pairs vs exact ground truth: {err}")

    ngi = np.asarray(ann.neighbor_graph[0])
    purity = np.mean(y[ngi[:, 1]] == y)
    print(f"1-NN label purity: {purity:.3f}")

    try:
        import hdbscan
        import umap
    except ImportError:
        print("umap-learn/hdbscan not installed; skipping embedding")
        return

    S = ann.to_sparse_matrix().tocsr()
    emb = umap.UMAP(metric="precomputed", n_neighbors=25).fit_transform(S)
    labels = hdbscan.HDBSCAN(min_cluster_size=25).fit_predict(emb)
    from collections import Counter

    print("HDBSCAN clusters:", Counter(labels).most_common())


if __name__ == "__main__":
    main()
