"""Scout/certify hybrid + batched graph-SP metric tests.

Covers the two framework-level additions beyond the reference surface:
the scout/certify hybrid (cheap approximate engine drives the search,
exact engine certifies the reported graph) and the source-grouped
shortest-path metric engine (reference doc/user_guide.rst:540-560
workload, reference tests/test_annchor.py:105-145)."""

import numpy as np
import pytest

import annchor_tpu as at
from annchor_tpu.datasets import grid_cost_matrix, load_digits, make_graph
from annchor_tpu.graph_sp import GraphShortestPathMetric, shortest_path_metric
from annchor_tpu.ops.wasserstein import SinkhornExpEngine


@pytest.fixture(scope="module")
def digits300():
    data = load_digits()
    return data["X"][:300], data["cost_matrix"]


def test_sinkhorn_exp_engine_close_to_exact(digits300):
    X, M = digits300
    from annchor_tpu import native

    rng = np.random.default_rng(0)
    IJ = rng.integers(0, len(X), size=(200, 2)).astype(np.int64)
    eng = SinkhornExpEngine(M)
    approx = eng(X, X, IJ)
    exact = native.emd_batch(
        np.ascontiguousarray(X, np.float64), np.ascontiguousarray(X, np.float64),
        np.ascontiguousarray(M, np.float64), IJ[:, 0], IJ[:, 1],
    )
    err = approx - exact
    # entropic bias is small and one-sided-ish; ranking noise is tiny
    assert np.abs(err).max() < 0.1
    assert err.std() < 0.02


def test_sinkhorn_exp_eps_guard():
    M = grid_cost_matrix()
    with pytest.raises(ValueError):
        SinkhornExpEngine(M, eps=0.001)


@pytest.mark.slow
def test_hybrid_scout_certify_pipeline(digits300):
    """Full hybrid fit on a digits subset: errors counted against the
    exact brute-force graph, certification pays only a small exact
    budget, and every reported distance is exact."""
    X, M = digits300
    k = 10
    bf = at.BruteForce(X, "wasserstein", func_kwargs={"cost_matrix": M})
    bf.fit()
    ann = at.Annchor(
        X,
        "wasserstein",
        func_kwargs={"cost_matrix": M, "scout": "sinkhorn"},
        n_anchors=15,
        n_neighbors=k,
        n_samples=2000,
        p_work=0.3,
        random_seed=42,
    )
    ann.fit()
    assert ann._scouting
    assert ann.scout_evals > 0
    # exact calls = certification only: far below the scout budget
    assert ann.evals < 0.35 * ann.scout_evals
    err = at.compare_neighbor_graphs(bf.neighbor_graph, ann.neighbor_graph, k)
    assert err < 6
    # certified rows: every reported neighbour distance matches the
    # exact brute-force distance matrix
    ngi, ngd = ann.neighbor_graph
    rows = np.arange(len(X))
    for col in range(1, k):
        ok = ngi[:, col] >= 0
        np.testing.assert_allclose(
            ngd[ok, col], bf.D[rows[ok], ngi[ok, col]], atol=1e-9
        )


def test_user_evaluator_beats_scout(digits300):
    """A user-supplied get_exact_ijs must win over the scout hybrid
    (the plug-in contract, reference annchor.py:77-82)."""
    X, M = digits300
    calls = []

    def mine(f, X_, IJ):
        calls.append(len(IJ))
        return np.array([f(X_[i], X_[j]) for i, j in IJ])

    ann = at.Annchor(
        X[:60],
        "wasserstein",
        func_kwargs={"cost_matrix": M, "scout": "sinkhorn"},
        n_anchors=5,
        n_neighbors=5,
        n_samples=200,
        p_work=0.5,
        get_exact_ijs=mine,
    )
    assert not ann._scouting
    assert len(calls) > 0  # construction smoke test went through it


@pytest.mark.slow
def test_pure_sinkhorn_graph_recall(digits300):
    """wasserstein_sinkhorn end-to-end, scored against the *exact* EMD
    ground truth (VERDICT round-1 item 9): the entropic values carry a
    bias, so the assertion is neighbour-set recall, not the
    rounded-distance multiset (which penalises every approximate
    value).  The on-device OT approximation must preserve the graph's
    structure."""
    X, M = digits300
    k = 10
    bf = at.BruteForce(X, "wasserstein", func_kwargs={"cost_matrix": M})
    bf.fit()
    exact_sets = bf.neighbor_graph[0][:, :k]

    ann = at.Annchor(
        X,
        "wasserstein_sinkhorn",
        func_kwargs={"cost_matrix": M},
        n_anchors=15,
        n_neighbors=k,
        n_samples=2000,
        p_work=0.3,
        random_seed=42,
    )
    assert not ann.is_metric  # entropic OT must take the non-metric path
    ann.fit()
    got = ann.neighbor_graph[0][:, :k]
    hits = sum(
        len(np.intersect1d(exact_sets[i], got[i])) for i in range(len(X))
    )
    recall = hits / (k * len(X))
    assert recall >= 0.9


# ---------------------------------------------------------------------------
# graph shortest-path metric


@pytest.fixture(scope="module")
def small_graph():
    from scipy.sparse import coo_matrix

    # denser inter-cluster edges: strongly multimodal sp distances
    # leave empty stratification bins (the sampler raises, like the
    # reference's), which is not what this test is about
    edges, weights, y = make_graph(
        n_vertices=200, n_clusters=4, p_intra=0.15, p_inter=0.03, seed=3
    )
    n = len(y)
    A = coo_matrix(
        (
            np.concatenate([weights, weights]),
            (
                np.concatenate([edges[:, 0], edges[:, 1]]),
                np.concatenate([edges[:, 1], edges[:, 0]]),
            ),
        ),
        shape=(n, n),
    ).tocsr()
    return A, n


def test_graph_sp_engine_matches_closure(small_graph):
    A, n = small_graph
    metric = GraphShortestPathMetric(A)
    closure = shortest_path_metric(A)
    rng = np.random.default_rng(0)
    IJ = rng.integers(0, n, size=(50, 2)).astype(np.int64)
    X = np.arange(n)
    batch = metric.batch(X, X, IJ)
    ref = np.array([closure(i, j) for i, j in X[IJ]])
    np.testing.assert_allclose(batch, ref)
    # scalar path agrees too
    assert metric(3, 7) == pytest.approx(closure(3, 7))


def test_graph_sp_pipeline_exactness(small_graph):
    """Annchor with the batched SP engine matches BruteForce with the
    closure metric on a small graph (generous budget => 0 errors)."""
    A, n = small_graph
    X = np.arange(n)
    bf = at.BruteForce(X, GraphShortestPathMetric(A))
    bf.fit()
    ann = at.Annchor(
        X,
        GraphShortestPathMetric(A),
        n_anchors=12,
        n_neighbors=8,
        n_samples=800,
        p_work=0.5,
        random_seed=5,
    )
    ann.fit()
    err = at.compare_neighbor_graphs(bf.neighbor_graph, ann.neighbor_graph, 8)
    assert err <= 2


@pytest.mark.slow
def test_certify_graph_expansion_recovers_scout_misranks():
    """Graph-expansion certify (Annchor._certify): a scout whose
    deterministic per-pair noise buries some true neighbours deep in
    its ranking must still yield the exact graph — the expansion
    scout-screens neighbours-of-neighbours of each exact top list and
    certifies those within the residual-calibrated margin.  With the
    expansion disabled the same fit leaves errors."""
    from annchor_tpu.metrics import get_function_from_input

    rng = np.random.default_rng(1234)
    X = rng.normal(size=(300, 4))
    X[150:] += 3.0
    base = get_function_from_input("euclidean")

    def noisy_scout(Xa, Za, IJ):
        IJ = np.asarray(IJ)
        d = np.asarray(base.batch(Xa, Za, IJ), dtype=np.float64)
        i, j = IJ[:, 0], IJ[:, 1]
        # symmetric deterministic noise (same pair -> same value)
        return d + 0.3 * np.sin(0.7 * (i + j) + 0.13 * ((i * j) % 97))

    def build(expand_rounds):
        m = at.metrics.Metric(
            base.scalar, base.batch, name="euclid_noisy", scout=noisy_scout
        )
        ann = at.Annchor(
            X, m, n_anchors=15, n_neighbors=10, p_work=0.3, random_seed=42
        )
        ann.certify_pad = 2
        ann.certify_expand_rounds = expand_rounds
        ann.fit()
        return ann

    bf = at.BruteForce(X, "euclidean")
    bf.fit()

    ann0 = build(0)
    err0 = at.compare_neighbor_graphs(bf.neighbor_graph, ann0.neighbor_graph, 10)
    ann2 = build(2)
    err2 = at.compare_neighbor_graphs(bf.neighbor_graph, ann2.neighbor_graph, 10)
    assert err0 > 0          # the noise really buries neighbours
    assert err2 == 0         # expansion recovers every one of them
    # certification stays a small fraction of brute force
    assert ann2.evals < 0.5 * (300 * 299) // 2
