"""Multi-chip fit pipeline (ops/sharded_fit.py).

The candidate-pair state sharded over the 8-device virtual CPU mesh
must produce the *same* neighbor graph as the single-device fit —
bit-identical, not approximately (SURVEY.md §2.2; VERDICT r1 next #1).
Covers both the dense device pipeline (host pair list) and the sparse
scale path (device-built pair list), plus genuine shard residency of
the big arrays.
"""

import os

import numpy as np
import pytest
from sklearn.datasets import make_blobs

import annchor_tpu as at

# scale-path E2E fits: nightly/full tier (fast gate runs -m "not slow")
pytestmark = pytest.mark.slow


@pytest.fixture()
def _sharding_on():
    prev = os.environ.pop("ANNCHOR_TPU_DISABLE_SHARDING", None)
    yield
    if prev is not None:
        os.environ["ANNCHOR_TPU_DISABLE_SHARDING"] = prev


@pytest.fixture()
def _force_sparse():
    os.environ["ANNCHOR_TPU_FORCE_SPARSE"] = "1"
    yield
    os.environ.pop("ANNCHOR_TPU_FORCE_SPARSE", None)


def _blobs(n=500):
    X, _ = make_blobs(
        n_samples=n, n_features=5, centers=6, random_state=2
    )
    return X


def _fit(X, sharded, **kw):
    if sharded:
        os.environ.pop("ANNCHOR_TPU_DISABLE_SHARDING", None)
    else:
        os.environ["ANNCHOR_TPU_DISABLE_SHARDING"] = "1"
    try:
        ann = at.Annchor(X, **kw)
        ann.fit()
        return ann
    finally:
        os.environ.pop("ANNCHOR_TPU_DISABLE_SHARDING", None)


BLOBS_KW = dict(
    func="euclidean", n_anchors=12, n_neighbors=10,
    n_samples=800, p_work=0.2, random_seed=42,
)


def test_sharded_fit_matches_single_device(_sharding_on):
    """Dense device pipeline: the sharded fit's graph equals the
    single-device fit's exactly."""
    X = _blobs()
    a1 = _fit(X, False, **BLOBS_KW)
    a2 = _fit(X, True, **BLOBS_KW)
    assert np.array_equal(a1.neighbor_graph[0], a2.neighbor_graph[0])
    assert np.array_equal(a1.neighbor_graph[1], a2.neighbor_graph[1])


def test_sharded_sparse_fit_matches_single_device(
    _sharding_on, _force_sparse
):
    """Sparse scale path (device-built pair list): same equality."""
    from annchor_tpu.datasets import make_strings

    X, _ = make_strings(n=300, length=60, seed=7)
    kw = dict(
        func="levenshtein", n_anchors=12, n_neighbors=8,
        n_samples=800, p_work=0.3, random_seed=42,
    )
    # pin the cap: bit-identity holds at a MATCHED tracked pair set
    # (the derived cap deliberately scales with the mesh so multi-chip
    # buys coverage — Annchor._mesh_scale)
    os.environ["ANNCHOR_TPU_PAIR_CAP"] = "64"
    try:
        a1 = _fit(list(X), False, **kw)
        a2 = _fit(list(X), True, **kw)
    finally:
        os.environ.pop("ANNCHOR_TPU_PAIR_CAP", None)
    assert np.array_equal(a1.neighbor_graph[0], a2.neighbor_graph[0])
    assert np.array_equal(a1.neighbor_graph[1], a2.neighbor_graph[1])


def test_sharded_state_residency(_sharding_on, cpu_devices):
    """The pair state and incidence matrix genuinely live sharded:
    one addressable shard per device, each 1/n of the global array."""
    X = _blobs(400)
    ann = at.Annchor(X, **BLOBS_KW)
    ann.get_anchors()
    ann.get_locality()
    ann.get_features()
    dev = ann._dev
    n = len(cpu_devices)
    assert dev.shard is not None
    assert dev.m_pad % n == 0
    for arr in (dev.RA, dev.ncm, dev.lb, dev.ub, dev.dad, dev.ij_i):
        shards = arr.addressable_shards
        assert len(shards) == n
        assert shards[0].data.shape[0] == dev.m_pad // n
    pshards = dev.P_idx_d.addressable_shards
    assert len(pshards) == n
    assert pshards[0].data.shape[0] == dev.P_idx_d.shape[0] // n
    # accuracy budget still holds through a full sharded fit
    ann2 = at.Annchor(X, **BLOBS_KW)
    ann2.fit()
    bf = at.BruteForce(X, "euclidean")
    bf.fit()
    err = at.compare_neighbor_graphs(
        bf.neighbor_graph, ann2.neighbor_graph, 10
    )
    assert err == 0


def test_sharded_budgeted_build_matches_single_chip(_sharding_on):
    """The budgeted two-pass pair build distributed over the mesh
    (whole bands round-robin per chip, partial hist/P_cnt psum) is
    bit-identical to the single-chip band loop: same pairs, same
    order, same per-point counts."""
    from annchor_tpu.ops.locality import candidate_pairs_device_budgeted

    X = _blobs(600)
    ann = at.Annchor(X, **BLOBS_KW)
    ann.get_anchors()
    D = ann.D

    def build(sharded):
        if sharded:
            os.environ.pop("ANNCHOR_TPU_NO_SHARDED_BUILD", None)
        else:
            os.environ["ANNCHOR_TPU_NO_SHARDED_BUILD"] = "1"
        try:
            return candidate_pairs_device_budgeted(
                D, locality=5, loc_thresh=2, loc_min=20,
                per_point_cap=40, block=128,
            )
        finally:
            os.environ.pop("ANNCHOR_TPU_NO_SHARDED_BUILD", None)

    i1, j1, m1, sid1, S1, eff1, pc1 = build(False)
    i2, j2, m2, sid2, S2, eff2, pc2 = build(True)
    assert m1 == m2 and m1 > 0
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
    assert np.array_equal(np.asarray(j1), np.asarray(j2))
    assert np.array_equal(pc1, pc2)


def test_sharded_budgeted_fit_matches_single_device(
    _sharding_on, _force_sparse
):
    """Full fit through the sharded budgeted build (PAIR_CAP forces
    the budgeted path at test scale) equals the single-device fit."""
    os.environ["ANNCHOR_TPU_PAIR_CAP"] = "48"
    try:
        X = _blobs(500)
        a1 = _fit(X, False, **BLOBS_KW)
        a2 = _fit(X, True, **BLOBS_KW)
    finally:
        os.environ.pop("ANNCHOR_TPU_PAIR_CAP", None)
    assert np.array_equal(a1.neighbor_graph[0], a2.neighbor_graph[0])
    assert np.array_equal(a1.neighbor_graph[1], a2.neighbor_graph[1])


@pytest.mark.skipif(
    not os.environ.get("ANNCHOR_TPU_SLOW_TESTS"),
    reason="slow 20k residency test; set ANNCHOR_TPU_SLOW_TESTS=1",
)
def test_sharded_residency_at_scale(_sharding_on, _force_sparse,
                                    cpu_devices):
    """VERDICT r2 next #4 at real scale: a 20k forced-sparse fit keeps
    ~m/s pairs per shard (the multi-chip memory win) and the
    mesh-scaled auto cap tracks ~s times the single-chip candidate
    set (the coverage win)."""
    X, _ = make_blobs(
        n_samples=20000, n_features=6, centers=16, random_state=7
    )
    kw = dict(
        func="euclidean", n_anchors=24, n_neighbors=10,
        n_samples=3000, p_work=0.01, random_seed=42,
    )
    a_s = _fit(X, True, **kw)
    dev = a_s._dev
    n = len(cpu_devices)
    assert dev.shard is not None
    shards = dev.RA.addressable_shards
    assert len(shards) == n
    assert shards[0].data.shape[0] == dev.m_pad // n
    m_sharded = dev.m

    a_1 = _fit(X, False, **kw)
    m_single = a_1._dev.m
    # the mesh-scaled cap admits a materially wider candidate set
    assert m_sharded > 2 * m_single


def test_sharded_enemy_refine_narrow_pidx(_sharding_on, _force_sparse):
    """Enemy refinement on a SHARDED state whose incidence matrix is
    narrower than the k=50 refine fan-out must clamp like the
    unsharded twin instead of failing top_k (regression: ValueError
    'k argument to top_k must be no larger than size along axis' on
    small fits / tight pair caps)."""
    X, y = make_blobs(
        n_samples=40, n_features=4, centers=2, cluster_std=0.8,
        random_state=9,
    )
    kw = dict(
        func="euclidean", n_anchors=6, n_neighbors=3,
        n_samples=100, p_work=0.4, random_seed=42,
    )
    a_s = _fit(X, True, **kw)
    assert a_s._dev is not None and a_s._dev.shard is not None
    assert a_s._dev.P_idx_d.shape[1] < 50  # the regression's trigger
    ngi_s, ngd_s = a_s.get_nearest_enemies(y, nn=2)

    a_1 = _fit(X, False, **kw)
    ngi_1, ngd_1 = a_1.get_nearest_enemies(y, nn=2)
    np.testing.assert_allclose(ngd_s, ngd_1, rtol=1e-5, atol=1e-6)
    assert (y[ngi_s] != y[:, None]).all()
