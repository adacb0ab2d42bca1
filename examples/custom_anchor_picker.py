"""Plugging a custom anchor picker into the pipeline.

Mirrors the reference's CustomAnchorPicker notebook
(/root/reference/Examples/CustomAnchorPicker.ipynb): any object with
``get_anchors(ann) -> (A, D, evals)`` drops into the strategy slot —
A are the anchor indices, D the (nx, n_anchors) anchor-distance
matrix, evals the metric-call count.  Shown here:

- the built-in SelectedAnchorPicker (hand-chosen anchor indices),
- a from-scratch LabelSpreadPicker that spends one anchor per class
  label (a supervised seeding the built-ins don't offer).

    python examples/custom_anchor_picker.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class LabelSpreadPicker:
    """One anchor per class: the medoid-ish member closest to the
    class mean, anchor columns evaluated as one batch per anchor."""

    def __init__(self, y):
        self.y = np.asarray(y)

    def get_anchors(self, ann):
        X = np.asarray(ann.X, dtype=np.float64)
        A = []
        for lbl in np.unique(self.y)[: ann.n_anchors]:
            members = np.flatnonzero(self.y == lbl)
            mu = X[members].mean(axis=0)
            A.append(members[np.argmin(
                np.linalg.norm(X[members] - mu, axis=1)
            )])
        A = np.asarray(A, dtype=int)
        cols = []
        for a in A:
            IJ = np.stack(
                [np.full(ann.nx, a, dtype=np.int64),
                 np.arange(ann.nx)], axis=1,
            )
            cols.append(np.asarray(
                ann.get_exact_ijs(ann.f, ann.X, IJ), dtype=np.float64
            ))
        D = np.stack(cols, axis=1)
        return A, D, len(A) * ann.nx


def main():
    import annchor_tpu as at
    from annchor_tpu.pickers import SelectedAnchorPicker
    from sklearn.datasets import make_blobs

    X, y = make_blobs(centers=10, n_samples=1000, random_state=42)

    for name, picker in [
        ("default MaxMin", None),
        ("SelectedAnchorPicker", SelectedAnchorPicker(
            np.arange(0, 1000, 100))),
        ("LabelSpreadPicker", LabelSpreadPicker(y)),
    ]:
        kwargs = dict(n_anchors=10, p_work=0.1, random_seed=42)
        if picker is not None:
            kwargs["anchor_picker"] = picker
        ann = at.Annchor(X, "euclidean", **kwargs)
        ann.fit()
        bf = at.BruteForce(X, "euclidean")
        bf.fit()
        err = at.compare_neighbor_graphs(
            bf.neighbor_graph, ann.neighbor_graph, 15
        )
        print(f"{name:>22}: anchors {sorted(ann.A)[:5]}... "
              f"errors {err}")


if __name__ == "__main__":
    main()
