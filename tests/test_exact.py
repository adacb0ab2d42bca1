"""exact_knn / exact_rows: blocked exact ground truth vs oracles.

The reference's accuracy contract compares every row against an exact
graph (reference annchor/tests/test_annchor.py:95-102); exact_knn is
the scale-capable oracle that makes that contract checkable at 20k+.
"""

import numpy as np
import pytest

import annchor_tpu as at
from annchor_tpu.datasets import make_strings


@pytest.fixture(scope="module")
def strings():
    X, y = make_strings(n=300, n_clusters=8, length=60, seed=3, evolve=True)
    return list(X)


def _oracle_knn(X, metric, k):
    n = len(X)
    f = at.get_function_from_input(metric, None)
    D = np.zeros((n, n))
    iu = np.triu_indices(n, k=1)
    IJ = np.stack(iu, axis=1)
    D[iu] = f.batch(X, X, IJ)
    D += D.T
    idx = np.argsort(D, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(D, idx, axis=1)


def test_exact_knn_strings_matches_bruteforce(strings):
    k = 7
    oi, od = _oracle_knn(strings, "levenshtein", k)
    idx, dist = at.exact_knn(strings, "levenshtein", k=k, block=32)
    assert idx.shape == (len(strings), k)
    # distances must match exactly; indices may differ inside tie
    # groups (the reference's own error metric is distance-based)
    np.testing.assert_array_equal(dist, od)
    # and the self column leads every row
    assert (dist[:, 0] == 0).all()


def test_exact_knn_rows_subset(strings):
    rows = np.array([5, 17, 123])
    idx, dist = at.exact_knn(strings, "levenshtein", k=5, rows=rows, block=2)
    oi, od = _oracle_knn(strings, "levenshtein", 5)
    np.testing.assert_array_equal(dist, od[rows])


def test_exact_knn_euclidean_blobs(blobs):
    X, _ = blobs
    X = X[:200]
    k = 6
    oi, od = _oracle_knn(X, "euclidean", k)
    idx, dist = at.exact_knn(X, "euclidean", k=k, block=64)
    np.testing.assert_allclose(dist, od, atol=1e-5)


def test_exact_rows_matches_batch(strings):
    rows = np.array([0, 42])
    R = at.exact_rows(strings, "levenshtein", rows=rows, block=2)
    f = at.get_function_from_input("levenshtein", None)
    n = len(strings)
    for t, r in enumerate(rows):
        IJ = np.stack([np.full(n, r), np.arange(n)], axis=1)
        np.testing.assert_array_equal(R[t], f.batch(strings, strings, IJ))


def test_exact_query_rows(strings):
    X, Q = strings[:250], strings[250:]
    R = at.exact_query_rows(X, Q, "levenshtein", block=8)
    assert R.shape == (len(Q), len(X))
    f = at.get_function_from_input("levenshtein", None)
    XQ = X + Q
    IJ = np.stack(
        [np.full(len(X), 250 + 3), np.arange(len(X))], axis=1
    )
    np.testing.assert_array_equal(R[3], f.batch(XQ, XQ, IJ))


def test_exact_knn_full_population_compare(strings):
    """exact_knn output slots straight into compare_neighbor_graphs."""
    k = 8
    idx, dist = at.exact_knn(strings, "levenshtein", k=k)
    errors = at.compare_neighbor_graphs((idx, dist), (idx, dist), k)
    assert errors == 0


def test_exact_query_rows_preserves_engine_cache(strings):
    """The X+Q oracle must not evict the fitted dataset's encoding
    from the levenshtein engine's single-slot cache (the next metric
    call on X would re-encode + re-upload the whole corpus)."""
    import annchor_tpu.metrics as metrics

    f = at.get_function_from_input("levenshtein", None)
    eng = f.batch
    assert isinstance(eng, metrics._LevenshteinEngine)
    enc_before = eng._encode(strings)  # prime the cache with X
    Q = strings[:5]
    at.exact_query_rows(strings, Q, f)
    # still a cache hit for X: identical encoding object
    assert eng._encode(strings) is enc_before


def test_exact_rows_scalar_metric_blocked(blobs):
    """The no-batch-engine fallback must produce correct full rows
    (exercises the blocked scalar path)."""
    X, _ = blobs
    X = X[:60]

    f = at.Metric(lambda a, b: float(np.abs(a - b).sum()), name="l1")
    rows = np.array([3, 17, 41])
    R = at.exact_rows(list(X), f, rows=rows, block=2)
    for t, r in enumerate(rows):
        np.testing.assert_allclose(
            R[t], np.abs(X - X[r]).sum(axis=1), rtol=1e-9
        )
