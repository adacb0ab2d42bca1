"""Checkpoint / resume (annchor_tpu.io) — a TPU-framework extra; the
reference has no persistence (SURVEY.md §5)."""

import numpy as np
import pytest

import annchor_tpu as at


@pytest.fixture(scope="module")
def fitted(blobs):
    X, y = blobs
    X = X[:300]
    ann = at.Annchor(
        X, "euclidean", n_anchors=10, n_neighbors=10, n_samples=500,
        p_work=0.3, random_seed=42,
    )
    ann.fit()
    return ann, X


def test_save_load_roundtrip(fitted, tmp_path):
    ann, X = fitted
    p = str(tmp_path / "index.npz")
    ann.save(p)
    ann2 = at.Annchor.load(p, X, "euclidean")
    np.testing.assert_array_equal(
        ann2.neighbor_graph[0], ann.neighbor_graph[0]
    )
    np.testing.assert_allclose(
        ann2.neighbor_graph[1], ann.neighbor_graph[1]
    )
    assert ann2.evals == ann.evals


def test_loaded_index_serves_queries(fitted, tmp_path, rng):
    ann, X = fitted
    p = str(tmp_path / "index.npz")
    ann.save(p)
    ann2 = at.Annchor.load(p, X, "euclidean")
    Q = X[:20] + rng.normal(scale=0.01, size=(20, 2))
    gi1, gd1 = ann.query(Q, nn=5, p_work=0.5)
    gi2, gd2 = ann2.query(Q, nn=5, p_work=0.5)
    # same fitted models -> same answers
    np.testing.assert_array_equal(gi1, gi2)
    np.testing.assert_allclose(gd1, gd2)
    # and they are correct
    assert (gi2[:, 0] == np.arange(20)).all()


@pytest.mark.slow
def test_loaded_index_refines(tmp_path):
    """The persisted per-edge exactness (ng_exact) must survive the
    round trip so refine_neighbor_graph on a LOADED index certifies
    only genuinely-predicted edges and still recovers cap losses."""
    import os

    from sklearn.datasets import make_blobs

    # The cap is only honoured on the scale path (nx > 4096 or forced
    # sparse), and predicted edges only survive assembly when the eval
    # budget is well short of the tracked-pair count — hence the tight
    # p_work / few anchors (measured: 68 inexact edges on this seed).
    X, _ = make_blobs(
        n_samples=800, centers=8, n_features=5, random_state=11
    )
    os.environ["ANNCHOR_TPU_PAIR_CAP"] = "120"
    os.environ["ANNCHOR_TPU_FORCE_SPARSE"] = "1"
    try:
        ann = at.Annchor(
            X, "euclidean", n_anchors=5, n_neighbors=8,
            n_samples=500, p_work=0.03, random_seed=7,
        )
        ann.fit()
    finally:
        os.environ.pop("ANNCHOR_TPU_PAIR_CAP", None)
        os.environ.pop("ANNCHOR_TPU_FORCE_SPARSE", None)
    # the capped sparse fit must leave some predicted (inexact) edges,
    # or the refine assertions below are vacuous
    assert (~getattr(ann, "_ng_exact")).any()
    p = str(tmp_path / "index.npz")
    ann.save(p)
    ann2 = at.Annchor.load(p, X, "euclidean")
    np.testing.assert_array_equal(
        getattr(ann, "_ng_exact"), getattr(ann2, "_ng_exact")
    )

    bf = at.BruteForce(X, "euclidean")
    bf.fit()
    err_before = at.compare_neighbor_graphs(
        bf.neighbor_graph, ann2.neighbor_graph, 8
    )
    ev0 = ann2.evals
    ann2.refine_neighbor_graph(rounds=2, budget=2000)
    err_after = at.compare_neighbor_graphs(
        bf.neighbor_graph, ann2.neighbor_graph, 8
    )
    assert ann2.evals - ev0 <= 2000
    assert err_after <= err_before
    # structurally sound rows after refining a loaded index
    gi, gd = ann2.neighbor_graph
    assert (gi[:, 0] == np.arange(len(X))).all()
    assert (np.diff(gd, axis=1) >= 0).all()


def test_save_before_fit_raises(blobs, tmp_path):
    X, _ = blobs
    ann = at.Annchor(X[:100], "euclidean", n_anchors=5, n_samples=100,
                     p_work=0.5)
    with pytest.raises(ValueError, match="fit"):
        ann.save(str(tmp_path / "x.npz"))


def test_load_wrong_dataset_size(fitted, tmp_path):
    ann, X = fitted
    p = str(tmp_path / "index.npz")
    ann.save(p)
    with pytest.raises(ValueError, match="points"):
        at.Annchor.load(p, X[:100], "euclidean")


@pytest.fixture(scope="module")
def sparse_fitted():
    """A budget-capped scale-path fit (sparse device pipeline)."""
    import os

    from sklearn.datasets import make_blobs

    X, _ = make_blobs(
        n_samples=900, centers=8, n_features=5, random_state=4
    )
    os.environ["ANNCHOR_TPU_FORCE_SPARSE"] = "1"
    try:
        ann = at.Annchor(
            X, "euclidean", n_anchors=12, n_neighbors=10,
            n_samples=1000, p_work=0.2, random_seed=42, pair_cap=100,
        )
        ann.fit()
    finally:
        os.environ.pop("ANNCHOR_TPU_FORCE_SPARSE", None)
    return ann, X


def test_v2_save_never_materialises(sparse_fitted, tmp_path):
    """Scale-path saves must not pull the O(m) pair state to host —
    the whole point of the sparse pipeline (VERDICT r3 weak #1)."""
    ann, X = sparse_fitted
    p = str(tmp_path / "sparse.npz")
    ann.save(p)
    assert ann._IJs is None
    assert ann._features is None
    assert ann._RefineApprox is None
    z = np.load(p)
    assert int(z["format"]) == 2
    assert "IJs" not in z.files and "features" not in z.files
    # exact store dumped under canonical keys, sorted
    assert "exact_keys" in z.files
    assert np.all(np.diff(z["exact_keys"]) > 0)
    assert z["exact_vals"].shape == z["exact_keys"].shape


def test_v2_roundtrip_serves_queries(sparse_fitted, tmp_path, rng):
    ann, X = sparse_fitted
    p = str(tmp_path / "sparse.npz")
    ann.save(p)
    ann2 = at.Annchor.load(p, X, "euclidean")
    np.testing.assert_array_equal(
        np.asarray(ann2.neighbor_graph[0]),
        np.asarray(ann.neighbor_graph[0]),
    )
    assert ann2.evals == ann.evals
    Q = X[:15] + rng.normal(scale=0.01, size=(15, 5))
    gi1, gd1 = ann.query(Q, nn=5, p_work=0.5)
    gi2, gd2 = ann2.query(Q, nn=5, p_work=0.5)
    np.testing.assert_array_equal(np.asarray(gi1), np.asarray(gi2))
    np.testing.assert_allclose(np.asarray(gd1), np.asarray(gd2))


def test_v2_exact_store_values_correct(sparse_fitted, tmp_path):
    """Stored exact values must equal the metric on their pairs."""
    ann, X = sparse_fitted
    p = str(tmp_path / "sparse.npz")
    ann.save(p)
    z = np.load(p)
    keys = z["exact_keys"][:200]
    vals = z["exact_vals"][:200]
    i, j = keys // ann.nx, keys % ann.nx
    d = np.linalg.norm(X[i] - X[j], axis=1)
    np.testing.assert_allclose(vals, d, rtol=1e-6)


def test_v2_rebuild_pairs(sparse_fitted, tmp_path):
    """The build knobs (pair_cap, p_work, loc_min, ...) persist in the
    checkpoint: rebuild_pairs must reproduce the fit's tracked pair
    list WITHOUT the caller re-supplying the kwargs."""
    ann, X = sparse_fitted
    p = str(tmp_path / "sparse.npz")
    ann.save(p)
    import os

    os.environ["ANNCHOR_TPU_FORCE_SPARSE"] = "1"
    try:
        ann2 = at.Annchor.load(p, X, "euclidean", rebuild_pairs=True)
    finally:
        os.environ.pop("ANNCHOR_TPU_FORCE_SPARSE", None)
    assert ann2.pair_cap == ann.pair_cap == 100
    assert ann2.p_work == ann.p_work
    assert ann2.loc_min == ann.loc_min
    assert ann2._ij_dev is not None
    # identical deterministic build: same tracked pair count
    assert int(ann2._ij_dev[2]) == int(ann._ij_dev[2])


def test_v2_include_exact_false(sparse_fitted, tmp_path):
    ann, X = sparse_fitted
    p = str(tmp_path / "lean.npz")
    ann.save(p, include_exact=False)
    z = np.load(p)
    assert "exact_keys" not in z.files
    ann2 = at.Annchor.load(p, X, "euclidean")
    np.testing.assert_array_equal(
        np.asarray(ann2.neighbor_graph[0]),
        np.asarray(ann.neighbor_graph[0]),
    )


def test_v2_loaded_refine_reuses_exact_store(sparse_fitted, tmp_path):
    """refine_neighbor_graph on a loaded v2 index must serve 2-hop
    candidates the fit already evaluated from the persisted exact
    store instead of re-paying metric calls for them."""
    ann, X = sparse_fitted
    p = str(tmp_path / "sparse.npz")
    ann.save(p)
    ann2 = at.Annchor.load(p, X, "euclidean")
    assert ann2._exact_keys.size > 0
    evals0 = ann2.evals
    budget = 200
    ann2.refine_neighbor_graph(rounds=2, budget=budget)
    spent = ann2.evals - evals0
    hits = sum(s.get("store_hits", 0) for s in ann2._refine_stats)
    # the pool seeds from graph edges the fit computed exactly, so the
    # expansion must find at least some stored pairs for free
    assert hits > 0
    assert spent <= budget
    # every refined-graph distance must be the true metric value
    gi, gd = ann2.neighbor_graph
    gi, gd = np.asarray(gi), np.asarray(gd)
    rows = np.arange(0, ann2.nx, 37)
    for r in rows:
        d = np.linalg.norm(X[gi[r, 1:]] - X[r], axis=1)
        np.testing.assert_allclose(gd[r, 1:], d, rtol=1e-5, atol=1e-5)


def test_refine_skips_store_for_scouting_ann(sparse_fitted, tmp_path):
    """A scout/certify hybrid's persisted store holds the SCOUT's
    values for exploration pairs (device_pipeline lands the active
    evaluator's distances), so refine must not serve candidates from
    it as if exact — that would admit approximate distances flagged
    pool_exact and skip their certify budget (ADVICE r4)."""
    ann, X = sparse_fitted
    p = str(tmp_path / "sparse.npz")
    ann.save(p)
    ann2 = at.Annchor.load(p, X, "euclidean")
    assert ann2._exact_keys.size > 0
    # simulate a hybrid fit: the gate keys off _scouting, not the
    # metric, so flip the flag on the loaded index directly
    ann2._scouting = True
    ann2._exact_eval = ann2.get_exact_ijs
    ann2.refine_neighbor_graph(rounds=1, budget=100)
    hits = sum(s.get("store_hits", 0) for s in ann2._refine_stats)
    assert hits == 0


def test_env_pair_cap_zero_overrides_ctor(tmp_path):
    """ANNCHOR_TPU_PAIR_CAP=0 must restore the derived-cap behavior
    even when the constructor passed an explicit pair_cap (the env
    var is documented as the sweep override)."""
    import os

    from sklearn.datasets import make_blobs

    X, _ = make_blobs(
        n_samples=600, centers=6, n_features=4, random_state=7
    )
    os.environ["ANNCHOR_TPU_FORCE_SPARSE"] = "1"
    try:
        ann_cap = at.Annchor(
            X, "euclidean", n_anchors=10, n_neighbors=8,
            n_samples=800, p_work=0.3, random_seed=1, pair_cap=60,
        )
        ann_cap.get_anchors()
        ann_cap.get_locality()
        os.environ["ANNCHOR_TPU_PAIR_CAP"] = "0"
        try:
            ann_env = at.Annchor(
                X, "euclidean", n_anchors=10, n_neighbors=8,
                n_samples=800, p_work=0.3, random_seed=1, pair_cap=60,
            )
            ann_env.get_anchors()
            ann_env.get_locality()
        finally:
            os.environ.pop("ANNCHOR_TPU_PAIR_CAP", None)
        ann_def = at.Annchor(
            X, "euclidean", n_anchors=10, n_neighbors=8,
            n_samples=800, p_work=0.3, random_seed=1,
        )
        ann_def.get_anchors()
        ann_def.get_locality()
    finally:
        os.environ.pop("ANNCHOR_TPU_FORCE_SPARSE", None)
    # env 0 == no explicit cap (derived default), != the ctor cap
    assert int(ann_env._ij_dev[2]) == int(ann_def._ij_dev[2])
    assert int(ann_cap._ij_dev[2]) != int(ann_def._ij_dev[2])
