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


def test_make_digits_large():
    from annchor_tpu.datasets import make_digits_large

    X, y = make_digits_large()
    assert X.shape == (5620, 64) and y.shape == (5620,)
    # first 1797 rows are the untouched sklearn test split
    from sklearn.datasets import load_digits as _skl

    skl = _skl()
    assert np.array_equal(X[:1797], skl.data.astype(np.float64))
    assert np.array_equal(y[:1797], skl.target)
    # augmented rows: valid intensity range, non-degenerate mass,
    # label distribution matches the base split's classes
    aug = X[1797:]
    assert aug.min() >= 0 and aug.max() <= 16
    assert (aug.sum(axis=1) > 50).all()
    assert set(np.unique(y[1797:])) <= set(np.unique(y[:1797]))
    # deterministic
    X2, y2 = make_digits_large()
    assert np.array_equal(X, X2) and np.array_equal(y, y2)


def test_load_digits_large_cached_gt():
    from annchor_tpu.datasets import load_digits_large

    d = load_digits_large()  # GT npz is vendored; no regeneration
    ngi, ngd = d["neighbor_graph"]
    assert d["X"].shape == (5620, 64)
    assert ngi.shape == (5620, 100) and ngd.shape == (5620, 100)
    assert (np.diff(ngd, axis=1) >= -1e-9).all()
    # spot-check one GT distance against the exact solver
    from annchor_tpu import native

    i, j = int(ngi[0, 1]), 0
    want = ngd[0, 1]
    got = native.emd_single(d["X"][j], d["X"][i], d["cost_matrix"])
    assert abs(got - want) < 1e-8


def test_digits_large_gt_hash_matches():
    """The vendored GT npz carries a hash of the images it was computed
    from; regenerated images must still match it (ADVICE r1: numpy
    Generator bit-streams are not guaranteed stable across versions —
    a mismatch must trigger regeneration, not silent corruption)."""
    import os

    import annchor_tpu.datasets as ds

    g = np.load(os.path.join(ds._PKG_DIR, "data", "digits_large_gt.npz"))
    assert "xhash" in g
    X, _ = ds.make_digits_large()
    assert str(g["xhash"]) == ds._digest(X)


def test_native_unpack_pairs_roundtrip():
    from annchor_tpu import native

    rng = np.random.default_rng(7)  # local: keep the shared session
    # rng's stream position stable for order-sensitive tests
    nx = 200
    keep = rng.random((9, 224)) < 0.2
    keep[:, nx:] = False
    words = np.packbits(
        keep.astype(np.uint8), axis=1, bitorder="little"
    ).view(np.uint32).reshape(9, -1)
    i, j = native.unpack_pairs(words, nx, row_off=3)
    r, c = np.nonzero(keep[:, :nx])
    assert np.array_equal(i, (r + 3).astype(np.int32))
    assert np.array_equal(j, c.astype(np.int32))
    assert native.count_pairs(words) == keep.sum()
    out = np.empty((keep.sum(), 2), dtype=np.int32)
    n = native.unpack_pairs_into(words, nx, 3, out)
    assert n == keep.sum()
    assert np.array_equal(out[:, 0], i) and np.array_equal(out[:, 1], j)
