"""k-NN graph over a weighted graph's shortest-path metric.

Mirrors the reference's ShortestPath notebook
(/root/reference/Examples/ShortestPath.ipynb): the points are the 800
vertices of a sparse weighted graph and the "slow metric" is dijkstra
distance.  The reference calls a networkx closure per pair (~2.6 ms
each); the framework's GraphShortestPathMetric groups each batch by
source vertex into whole single-source solves (scipy C) with row
caching, so the entire fit costs at most nx SSSP solves.

    python examples/graph_shortest_path.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import annchor_tpu as at
    from annchor_tpu.datasets import load_graph_sp
    from annchor_tpu.graph_sp import GraphShortestPathMetric

    data = load_graph_sp()
    X = np.asarray(data["X"])

    ann = at.Annchor(
        X,
        GraphShortestPathMetric(data["A"]),
        n_anchors=20,
        n_neighbors=15,
        n_samples=5000,
        p_work=0.15,
        random_seed=5,
        verbose=True,
    )
    t0 = time.perf_counter()
    ann.fit()
    print(f"\nbuilt in {time.perf_counter() - t0:.1f}s "
          f"({ann.evals} pair evaluations)")

    err = at.compare_neighbor_graphs(
        ann.neighbor_graph, data["neighbor_graph"], 15
    )
    print(f"incorrect NN pairs vs exact ground truth: {err} "
          f"(reference notebook reports 2 at this budget)")

    # spot-check a few exact distances against scipy dijkstra
    from scipy.sparse.csgraph import dijkstra

    rows = dijkstra(data["A"], indices=[0])
    ngi, ngd = ann.neighbor_graph
    j = int(ngi[0, 1])
    print(f"d(0, {j}) = {ngd[0, 1]:.4f} (exact {rows[0, j]:.4f})")


if __name__ == "__main__":
    main()
