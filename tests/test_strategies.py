"""Unit tests for the pluggable strategy layer: samplers, regressors,
error predictors (reference samplers.py / regressors.py /
error_predictors.py semantics)."""

import numpy as np
import pytest

from annchor_tpu.error_predictors import SimpleStratifiedErrorRegression
from annchor_tpu.regressors import SimpleStratifiedLinearRegression
from annchor_tpu.samplers import (
    ClusterSampler,
    NothingToSample,
    SimpleStratifiedSampler,
)

FEATURES = ["lower bound", "upper bound", "double anchor distance"]


@pytest.fixture()
def feats(rng):
    m = 4000
    lb = rng.random(m) * 10
    ub = lb + rng.random(m) * 5
    dad = (lb + ub) / 2 + rng.normal(scale=0.3, size=m)
    return np.stack([lb, ub, dad], axis=1)


def test_stratified_sampler_covers_bins(feats, rng):
    s = SimpleStratifiedSampler()
    ncm = np.ones(len(feats), dtype=bool)
    ixs, n, bins = s.sample(feats, FEATURES, 700, ncm, 42)
    assert n == len(ixs) == 700
    assert len(np.unique(ixs)) == 700  # without replacement
    # every bin contributed
    dad = feats[ixs, 2]
    counts, _ = np.histogram(dad, bins=bins)
    assert (counts >= 2).all()


def test_sampler_nothing_to_sample(feats):
    s = SimpleStratifiedSampler()
    ncm = np.zeros(len(feats), dtype=bool)
    with pytest.raises(NothingToSample):
        s.sample(feats, FEATURES, 100, ncm, 42)


def test_sampler_reduces_n_samples(feats, capsys):
    """n_samples beyond the data size gets reduced with a warning
    (reference samplers.py:125-130)."""
    s = SimpleStratifiedSampler()
    small = feats[:200]
    ncm = np.ones(200, dtype=bool)
    ixs, n, _ = s.sample(small, FEATURES, 5000, ncm, 42)
    assert n < 5000
    assert "Reducing n_samples" in capsys.readouterr().out


def test_sampler_seeded_determinism(feats):
    a = SimpleStratifiedSampler()
    b = SimpleStratifiedSampler()
    ncm = np.ones(len(feats), dtype=bool)
    ixs_a, *_ = a.sample(feats, FEATURES, 300, ncm, 7)
    ixs_b, *_ = b.sample(feats, FEATURES, 300, ncm, 7)
    np.testing.assert_array_equal(ixs_a, ixs_b)
    # the per-loop seed advances (reference utils.py:572)
    ixs_a2, *_ = a.sample(feats, FEATURES, 300, ncm, 7)
    assert not np.array_equal(ixs_a, ixs_a2)


def test_cluster_sampler(feats):
    s = ClusterSampler(n_partitions=4)
    ncm = np.ones(len(feats), dtype=bool)
    ixs, n, bins = s.sample(feats, FEATURES, 400, ncm, 42)
    assert n == len(ixs)
    assert bins.shape[0] == 5  # n_partitions + 1 edges


def test_regression_recovers_linear_model(rng):
    """Per-bin closed-form least squares must recover a planted linear
    relationship exactly (reference regressors.py:39-103 fits sklearn
    LinearRegression per bin)."""
    m = 3000
    lb = rng.random(m) * 10
    ub = lb + rng.random(m)
    dad = rng.random(m) * 10
    F = np.stack([lb, ub, dad], axis=1)
    y = 0.3 * lb + 0.5 * ub + 0.2 * dad + 1.7
    reg = SimpleStratifiedLinearRegression()
    reg.fit(F, FEATURES, y)
    pred = reg.predict(F, FEATURES)
    np.testing.assert_allclose(pred, y, rtol=1e-6, atol=1e-6)


def test_regression_respects_bins(rng):
    """Different linear models per stratification bin."""
    m = 4000
    dad = np.concatenate([rng.random(m // 2), 10 + rng.random(m // 2)])
    lb = rng.random(m)
    ub = lb + 1
    F = np.stack([lb, ub, dad], axis=1)
    y = np.where(dad < 5, 2 * lb, 7 * lb)  # different slope per regime
    reg = SimpleStratifiedLinearRegression(n_partitions=2)
    bins = np.array([-np.inf, 5.0, np.inf])
    reg.fit(F, FEATURES, y, sample_bins=bins)
    pred = reg.predict(F, FEATURES)
    np.testing.assert_allclose(pred, y, atol=1e-6)


def test_error_predictor_cdf(rng):
    m = 2000
    F = np.stack(
        [rng.random(m), rng.random(m), rng.random(m) * 10], axis=1
    )
    resid = rng.normal(size=m)
    ep = SimpleStratifiedErrorRegression()
    ep.fit(F, FEATURES, resid)
    labels = ep.predict(F, FEATURES)
    assert set(np.unique(labels)) <= set(range(ep.n_partitions))
    # residuals stored sorted per bin
    for k, errs in ep.errs.items():
        assert (np.diff(errs) >= 0).all()
    total = sum(len(e) for e in ep.errs.values())
    assert total >= m  # edge values may fall in two adjacent bins


def test_error_predictor_update_errors(rng):
    F = np.stack(
        [rng.random(500), rng.random(500), rng.random(500) * 10], axis=1
    )
    resid = rng.normal(size=500)
    ep = SimpleStratifiedErrorRegression()
    ep.fit(F, FEATURES, resid)
    before = {k: len(v) for k, v in ep.errs.items()}
    new_err = rng.normal(size=100) + 10  # clearly non-zero residuals
    parts = rng.integers(0, ep.n_partitions, size=100)
    ep.update_errors(new_err, parts)
    after = {k: len(v) for k, v in ep.errs.items()}
    assert sum(after.values()) == sum(before.values()) + 100
    for k in ep.errs:
        assert (np.diff(ep.errs[k]) >= 0).all()
