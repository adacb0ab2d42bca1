"""Unit tests for the device kernels against numpy oracles
(SURVEY.md §4: 'unit tests per kernel against numpy oracles')."""

import numpy as np
import pytest

from annchor_tpu.ops import pairs as pair_ops
from annchor_tpu.ops.bounds_update import tighten_bounds
from annchor_tpu.ops.features import anchor_membership, bounds_and_dad
from annchor_tpu.ops.locality import candidate_pairs, query_candidates


@pytest.fixture(scope="module")
def state(rng):
    """Random anchor-distance matrix + pair list."""
    nx, na = 60, 7
    X = rng.normal(size=(nx, 3))
    A_idx = rng.choice(nx, na, replace=False)
    D = np.linalg.norm(X[:, None, :] - X[None, A_idx, :], axis=2)
    iu = np.triu_indices(nx, k=1)
    IJs = np.stack(iu, axis=1).astype(np.int32)
    return X, D, IJs


def test_bounds_and_dad_oracle(state):
    X, D, IJs = state
    lb, ub, dad = bounds_and_dad(D, IJs[:, 0], IJs[:, 1])
    Di = D[IJs[:, 0]]
    Dj = D[IJs[:, 1]]
    np.testing.assert_allclose(
        lb, np.max(np.abs(Di - Dj), axis=1), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        ub, np.min(Di + Dj, axis=1), rtol=1e-5, atol=1e-5
    )
    # reference get_dad_ijs (utils.py:355-380):
    # dad = (D[i, cA[j]] + D[j, cA[i]]) / 2 with cA = argmin anchor
    cA = np.argmin(D, axis=1)
    want = (
        D[IJs[:, 0], cA[IJs[:, 1]]] + D[IJs[:, 1], cA[IJs[:, 0]]]
    ) / 2
    np.testing.assert_allclose(dad, want, rtol=1e-5, atol=1e-5)


def test_bounds_bracket_true_distance(state):
    """Triangle-inequality sanity: lb <= d <= ub for a true metric."""
    X, D, IJs = state
    lb, ub, _ = bounds_and_dad(D, IJs[:, 0], IJs[:, 1])
    d = np.linalg.norm(X[IJs[:, 0]] - X[IJs[:, 1]], axis=1)
    assert (lb <= d + 1e-4).all()
    assert (ub >= d - 1e-4).all()


def test_query_bounds_asymmetric(state, rng):
    """Query-side bounds use two different anchor matrices
    (reference query_functions.py:102-129)."""
    X, D, IJs = state
    QD = D[rng.choice(D.shape[0], 10)] + rng.random((10, D.shape[1]))
    I = rng.integers(0, D.shape[0], size=40)
    J = rng.integers(0, 10, size=40)
    lb, ub, _ = bounds_and_dad(D, I, J, DJ=QD)
    np.testing.assert_allclose(
        lb, np.max(np.abs(D[I] - QD[J]), axis=1), rtol=1e-5
    )
    np.testing.assert_allclose(
        ub, np.min(D[I] + QD[J], axis=1), rtol=1e-5
    )


def test_anchor_membership(state):
    _, D, _ = state
    locality = 4
    S, sid = anchor_membership(D, locality)
    S = np.asarray(S)
    # each row has exactly `locality` ones, at the nearest anchors
    assert (S.sum(axis=1) == locality).all()
    want = np.argsort(D, axis=1, kind="stable")[:, :locality]
    for i in range(D.shape[0]):
        assert set(np.nonzero(S[i])[0]) == set(want[i])


def test_candidate_pairs_properties(state):
    _, D, _ = state
    nx = D.shape[0]
    loc_min = 20
    IJs, sid, S, eff = candidate_pairs(D, 5, 2, loc_min)
    assert (IJs[:, 0] < IJs[:, 1]).all()
    # pairs unique
    keys = IJs[:, 0].astype(np.int64) * nx + IJs[:, 1]
    assert len(np.unique(keys)) == len(keys)
    # loc_min guarantee: every point appears in >= loc_min pairs
    counts = np.bincount(IJs.ravel(), minlength=nx)
    assert (counts >= loc_min).all()


def test_candidate_pairs_matches_bruteforce_threshold(state):
    """For loc_min=0 the rule collapses to
    counts[i,j] >= loc_thresh — check against a dense numpy oracle."""
    _, D, _ = state
    nx = D.shape[0]
    locality, loc_thresh = 5, 2
    IJs, _, S, _ = candidate_pairs(D, locality, loc_thresh, 0)
    counts = S @ S.T
    iu = np.triu_indices(nx, k=1)
    want = counts[iu] >= loc_thresh
    got = np.zeros(len(iu[0]), dtype=bool)
    keys = {(i, j) for i, j in IJs}
    for k, (i, j) in enumerate(zip(*iu)):
        got[k] = (i, j) in keys
    np.testing.assert_array_equal(got, want)


def test_query_candidates(state, rng):
    _, D, _ = state
    QD = np.abs(rng.normal(size=(5, D.shape[1])))
    S, _ = anchor_membership(D, 5)
    db_ids, q_ids = query_candidates(np.asarray(S), QD, 5, 2)
    Sq, _ = anchor_membership(QD, 5)
    counts = np.asarray(Sq) @ np.asarray(S).T
    for q in range(5):
        np.testing.assert_array_equal(
            db_ids[q_ids == q], np.nonzero(counts[q] >= 2)[0]
        )


def test_build_point_index(state, rng):
    _, _, IJs = state
    sub = IJs[rng.choice(len(IJs), 200, replace=False)]
    nx = 60
    P_idx, P_cnt = pair_ops.build_point_index(sub, nx)
    m = sub.shape[0]
    for i in range(nx):
        want = set(np.nonzero((sub[:, 0] == i) | (sub[:, 1] == i))[0])
        got = set(P_idx[i][P_idx[i] < m].tolist())
        assert got == want
        assert P_cnt[i] == len(want)


def test_build_point_index_single(rng):
    endpoints = rng.integers(0, 8, size=50)
    P_idx, P_cnt = pair_ops.build_point_index_single(endpoints, 8)
    for q in range(8):
        want = set(np.nonzero(endpoints == q)[0])
        got = set(P_idx[q][P_idx[q] < 50].tolist())
        assert got == want
        assert P_cnt[q] == len(want)


def test_kth_smallest_per_point(state, rng):
    _, _, IJs = state
    nx = 60
    RA = rng.random(len(IJs))
    P_idx, _ = pair_ops.build_point_index(IJs, nx)
    k = 5
    got = np.asarray(pair_ops.kth_smallest_per_point(RA, P_idx, k))
    # reference: np.partition(RA[I[i]], nn)[nn]  (annchor.py:399-404)
    for i in range(nx):
        vals = RA[(IJs[:, 0] == i) | (IJs[:, 1] == i)]
        want = np.partition(vals, k)[k]
        assert got[i] == pytest.approx(want, rel=1e-6)


def test_guarantee_nmin(state, rng):
    _, _, IJs = state
    nx = 60
    RA = rng.random(len(IJs))
    ncm = rng.random(len(IJs)) < 0.9
    P_idx, P_cnt = pair_ops.build_point_index(IJs, nx)
    nmin = 10
    out = pair_ops.guarantee_nmin(RA, ncm, P_idx, P_cnt, nmin)
    forced = out == -1.0
    # only uncomputed pairs may be forced
    assert (ncm[forced]).all()
    # afterwards every point has >= nmin computed-or-forced pairs
    for i in range(nx):
        mask = (IJs[:, 0] == i) | (IJs[:, 1] == i)
        n_ok = np.sum(~ncm[mask] | forced[mask])
        assert n_ok >= min(nmin, mask.sum())


def test_empirical_cdf_probs(rng):
    errs = {0: np.sort(rng.normal(size=50)), 1: np.sort(rng.normal(size=30))}
    p = rng.normal(size=40)
    labels = rng.integers(0, 2, size=40)
    got = pair_ops.empirical_cdf_probs(p, labels, errs)
    for k in range(40):
        e = errs[labels[k]]
        want = np.searchsorted(e, p[k]) / len(e)
        assert got[k] == pytest.approx(want)


def test_knn_from_pairs_oracle(state, rng):
    """Graph assembly against the reference get_nn semantics
    (utils.py:383-429): uncomputed pairs get +max(row) penalty."""
    _, _, IJs = state
    nx = 60
    RA = rng.random(len(IJs))
    ncm = rng.random(len(IJs)) < 0.5
    P_idx, _ = pair_ops.build_point_index(IJs, nx)
    nn = 7
    ngi, ngd, _ = pair_ops.knn_from_pairs(RA, IJs, P_idx, ncm, nn)
    for i in range(nx):
        mask = (IJs[:, 0] == i) | (IJs[:, 1] == i)
        ids = np.nonzero(mask)[0]
        d = RA[ids].copy()
        d[ncm[ids]] += RA[ids].max()
        order = ids[np.argsort(d, kind="stable")][:nn]
        want_d = RA[order]
        np.testing.assert_allclose(
            np.sort(ngd[i]), np.sort(want_d), rtol=1e-6
        )
        want_j = IJs[order].sum(axis=1) - i
        assert set(ngi[i].tolist()) == set(want_j.tolist())


def test_tighten_bounds(state, rng):
    """Pseudo-anchor tightening must keep bounds valid and only ever
    shrink the interval (reference utils.py:304-352)."""
    X, _, IJs = state
    nx = 60
    d_true = np.linalg.norm(X[IJs[:, 0]] - X[IJs[:, 1]], axis=1)
    ncm = rng.random(len(IJs)) < 0.6
    RA = d_true.copy()  # computed pairs hold exact values
    pending = np.nonzero(ncm)[0][:100]
    lb_old = np.maximum(d_true[pending] - rng.random(100) * 2, 0)
    ub_old = d_true[pending] + rng.random(100) * 2
    lb_new, ub_new = tighten_bounds(
        nx, IJs, RA, ncm, IJs[pending], lb_old, ub_old
    )
    assert (lb_new >= lb_old - 1e-6).all()
    assert (ub_new <= ub_old + 1e-6).all()
    assert (lb_new <= d_true[pending] + 1e-4).all()
    assert (ub_new >= d_true[pending] - 1e-4).all()


def test_tighten_bounds_column_subsample(state, rng):
    """max_cols < nx exercises the degree-based column selection."""
    X, _, IJs = state
    nx = 60
    d_true = np.linalg.norm(X[IJs[:, 0]] - X[IJs[:, 1]], axis=1)
    ncm = rng.random(len(IJs)) < 0.5
    pending = np.nonzero(ncm)[0][:50]
    lb_old = np.zeros(50)
    ub_old = np.full(50, 1e9)
    lb_new, ub_new = tighten_bounds(
        nx, IJs, d_true, ncm, IJs[pending], lb_old, ub_old, max_cols=16
    )
    assert (lb_new <= d_true[pending] + 1e-4).all()
    assert (ub_new >= d_true[pending] - 1e-4).all()
    assert (ub_new < 1e9).any()  # actually tightened something


def test_batch_dev_chunking_matches_unchunked():
    """batch_dev engines split large batches into bounded async
    dispatches; the chunked result must equal the one-shot result
    (and the host batch path) element for element."""
    import jax.numpy as jnp

    from annchor_tpu.metrics import get_function_from_input

    rng = np.random.default_rng(77)

    # dense engine
    X = rng.normal(size=(300, 6))
    eng = get_function_from_input("euclidean").batch
    I = rng.integers(0, 300, 5000).astype(np.int32)
    J = rng.integers(0, 300, 5000).astype(np.int32)
    one = np.asarray(eng.batch_dev(X, jnp.asarray(I), jnp.asarray(J)))
    eng.chunk = 512
    many = np.asarray(eng.batch_dev(X, jnp.asarray(I), jnp.asarray(J)))
    host = eng(X, X, np.stack([I, J], axis=1).astype(np.int64))
    np.testing.assert_array_equal(one, many)
    np.testing.assert_allclose(many.astype(np.float64), host, rtol=1e-6)

    # levenshtein engine (XLA myers dev path on CPU)
    from annchor_tpu.datasets import make_strings

    Xs, _ = make_strings(n=120, length=40, seed=5)
    lev = get_function_from_input("levenshtein").batch
    Il = rng.integers(0, 120, 4000).astype(np.int32)
    Jl = rng.integers(0, 120, 4000).astype(np.int32)
    Xl = list(Xs)
    one = np.asarray(lev.batch_dev(Xl, jnp.asarray(Il), jnp.asarray(Jl)))
    lev.dev_chunk = 777
    many = np.asarray(lev.batch_dev(Xl, jnp.asarray(Il), jnp.asarray(Jl)))
    host = lev(Xl, Xl, np.stack([Il, Jl], axis=1).astype(np.int64))
    np.testing.assert_array_equal(one, many)
    np.testing.assert_array_equal(many.astype(np.float64), host)


def test_tighten_cols_incidence_matches_pair_scatter(rng):
    """The incidence-row panel build (P_idx passed) must be
    BIT-identical to the pair-scatter build: same columns, same panel
    entries, same contender re-bounding.  The scale path switches
    between them on the P_idx degree cap (device_pipeline.tighten)."""
    import jax.numpy as jnp

    from annchor_tpu.ops.device_pipeline import (
        _pidx_from_pairs, _tighten_cols,
    )

    nx, m = 500, 6000
    # unique random pairs, i < j (tracked pair lists never repeat)
    key = rng.choice(nx * nx, size=4 * m, replace=False)
    a, b = key // nx, key % nx
    keep = a < b
    a, b = a[keep][:m], b[keep][:m]
    m = a.shape[0]
    ij_i = jnp.asarray(a.astype(np.int32))
    ij_j = jnp.asarray(b.astype(np.int32))
    RA = jnp.asarray(rng.random(m).astype(np.float32) * 50.0)
    ncm = jnp.asarray(rng.random(m) > 0.4)
    lb = RA * 0.4
    ub = RA * 1.6
    thresh = jnp.asarray(
        (rng.random(nx) * 30.0 + 10.0).astype(np.float32)
    )
    max_deg = int(
        (np.bincount(a, minlength=nx) + np.bincount(b, minlength=nx))
        .max()
    )
    P_idx = _pidx_from_pairs(ij_i, ij_j, nx, max_deg)

    args = (ij_i, ij_j, RA, ncm, lb, ub, thresh)
    lb0, ub0 = _tighten_cols(*args, ncol=64, cmax=2048, chunk=512)
    lb1, ub1 = _tighten_cols(
        *args, ncol=64, cmax=2048, chunk=512, P_idx=P_idx
    )
    assert np.array_equal(np.asarray(lb0), np.asarray(lb1))
    assert np.array_equal(np.asarray(ub0), np.asarray(ub1))
    # the run actually tightened something (not vacuous)
    assert (np.asarray(ub0) < np.asarray(ub) - 1e-6).any()

    # column-chunked passes (the nx=500k HBM guard: the (nx, ncol)
    # panel is processed col_chunk columns at a time, including a
    # non-dividing chunk that pads the column list with repeats) must
    # be bit-identical to the whole-panel program, on BOTH builds
    for ck in (16, 24):
        lb2, ub2 = _tighten_cols(
            *args, ncol=64, cmax=2048, chunk=512, col_chunk=ck
        )
        assert np.array_equal(np.asarray(lb0), np.asarray(lb2))
        assert np.array_equal(np.asarray(ub0), np.asarray(ub2))
        lb3, ub3 = _tighten_cols(
            *args, ncol=64, cmax=2048, chunk=512, P_idx=P_idx,
            col_chunk=ck,
        )
        assert np.array_equal(np.asarray(lb0), np.asarray(lb3))
        assert np.array_equal(np.asarray(ub0), np.asarray(ub3))
