"""Dataset loaders (reference tests/test_datasets.py:17-259 checks
shapes + pinned values; here shapes + ground-truth self-consistency,
since the data is regenerated rather than vendored)."""

import numpy as np
import pytest

from annchor_tpu.datasets import (
    grid_cost_matrix,
    load_graph_sp,
    load_strings,
    make_graph,
    make_strings,
)


def test_grid_cost_matrix():
    M = grid_cost_matrix(8, 8)
    assert M.shape == (64, 64)
    np.testing.assert_allclose(M, M.T)
    assert (np.diag(M) == 0).all()
    # corner-to-corner distance of the 8x8 grid
    assert M[0, -1] == pytest.approx(np.sqrt(2 * 49))


def test_make_strings_shape():
    X, y = make_strings(n=64, n_clusters=4, length=30, seed=0)
    assert len(X) == 64
    assert set(y) == {0, 1, 2, 3}
    lengths = np.array([len(s) for s in X])
    assert (lengths > 15).all() and (lengths < 45).all()


def test_load_strings_ground_truth():
    data = load_strings()
    X, ng = data["X"], data["neighbor_graph"]
    ngi, ngd = ng
    assert len(X) == ngi.shape[0]
    assert ngi.shape == ngd.shape
    # first column is self at distance 0; rows sorted ascending
    np.testing.assert_array_equal(ngi[:, 0], np.arange(len(X)))
    assert (ngd[:, 0] == 0).all()
    assert (np.diff(ngd, axis=1) >= 0).all()
    # spot-check a couple of distances against the scalar metric
    from annchor_tpu.distances import levenshtein

    for i in (0, 7):
        j = int(ngi[i, 1])
        assert levenshtein(X[i], X[j]) == pytest.approx(ngd[i, 1])


def test_make_graph_connectivity():
    edges, weights, y = make_graph(n_vertices=100, seed=0)
    assert edges.shape[1] == 2
    assert len(weights) == len(edges)
    assert (weights > 0).all()


def test_load_graph_sp():
    data = load_graph_sp()
    ngi, ngd = data["neighbor_graph"]
    n = len(data["X"])
    assert ngi.shape[0] == n
    assert (ngd[:, 0] == 0).all()
    assert (np.diff(ngd, axis=1) >= 0).all()
    assert data["A"].shape == (n, n)


@pytest.mark.slow
def test_load_digits():
    from annchor_tpu.datasets import load_digits

    data = load_digits()
    assert data["X"].shape == (1797, 64)
    assert data["cost_matrix"].shape == (64, 64)
    ngi, ngd = data["neighbor_graph"]
    assert ngi.shape[0] == 1797
    assert (np.diff(ngd, axis=1) >= -1e-9).all()
