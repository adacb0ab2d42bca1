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
