"""Instance selection: nearest-enemy graph + selective subset.

Reproduces the reference's selective-subset example (reference
tests/test_examples.py:61-85): pick a small subset of points whose
1-NN rule classifies the whole training set correctly.

    python examples/instance_selection.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from sklearn.datasets import make_blobs, make_moons

import annchor_tpu as at


def run(name, X, y):
    ann = at.Annchor(X, "euclidean", n_neighbors=15, p_work=0.2)
    ann.fit()

    enemies = ann.get_nearest_enemies(y)
    print(f"{name}: nearest enemy distances "
          f"min={enemies[1][:, 0].min():.3f} "
          f"median={np.median(enemies[1][:, 0]):.3f}")

    ss = ann.annchor_selective_subset(y)
    D = np.linalg.norm(X[:, None] - X[None], axis=2)
    nearest = ss[np.argmin(D[:, ss], axis=1)]
    acc = np.mean(y[nearest] == y)
    print(f"{name}: selective subset {len(ss)}/{len(X)} points, "
          f"1-NN training accuracy {acc:.3f}")

    rss = ann.alpha_rss(y)
    print(f"{name}: alpha-RSS subset {len(rss)}/{len(X)} points")


def main():
    np.random.seed(1)
    X, y = make_blobs(n_samples=1000, centers=5)
    run("blobs", X, y)
    U, v = make_moons(n_samples=1000, noise=0.1)
    run("moons", np.fliplr(U), v)


if __name__ == "__main__":
    main()
