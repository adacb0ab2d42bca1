"""Checkpoint / resume for fitted indexes.

The reference keeps all state as plain attributes on the Annchor
object and offers no persistence (SURVEY.md §5: "Checkpoint/resume:
none").  Rebuilding a graph costs real metric-call budget, so this
framework adds an explicit save/load: everything needed to serve
``query()`` / ``legacy_query()`` and to assemble the graph again goes
into one compressed ``.npz`` — anchor state, pair state, fitted
regression and error model — while the dataset and metric (which may
be an arbitrary callable) are re-supplied by the caller at load time.
"""

from __future__ import annotations

import numpy as np

__all__ = ["save_annchor", "load_annchor"]

_FORMAT = 1


def save_annchor(ann, path: str) -> None:
    """Persist a fitted Annchor index to ``path`` (.npz)."""
    if ann.neighbor_graph is None:
        raise ValueError("save_annchor: fit() has not been run")
    reg = ann.regression
    ep = ann.error_predictor
    err_labels = np.array(sorted(ep.errs.keys()), dtype=np.int64)
    payload = {
        "format": np.int64(_FORMAT),
        "nx": np.int64(ann.nx),
        "n_anchors": np.int64(ann.n_anchors),
        "n_neighbors": np.int64(ann.n_neighbors),
        "locality": np.int64(ann.locality),
        "loc_thresh": np.int64(ann.loc_thresh),
        "is_metric": np.bool_(ann.is_metric),
        "evals": np.int64(ann.evals),
        "A": np.asarray(ann.A, dtype=np.int64),
        "D": np.asarray(ann.D, dtype=np.float64),
        "S": np.asarray(ann.S, dtype=np.float32),
        "IJs": np.asarray(ann.IJs, dtype=np.int32),
        "RefineApprox": np.asarray(ann.RefineApprox, dtype=np.float64),
        "not_computed_mask": np.asarray(ann.not_computed_mask),
        "features": np.asarray(ann.features, dtype=np.float64),
        "ng_i": np.asarray(ann.neighbor_graph[0], dtype=np.int64),
        "ng_d": np.asarray(ann.neighbor_graph[1], dtype=np.float64),
        # per-edge exactness (optional, additive): lets a loaded index
        # run refine_neighbor_graph's certify pass correctly
        "ng_exact": np.asarray(
            getattr(ann, "_ng_exact", None)
            if getattr(ann, "_ng_exact", None) is not None
            else np.ones_like(ann.neighbor_graph[0], dtype=bool)
        ),
        # regression (SimpleStratifiedLinearRegression state)
        "reg_coefs": np.asarray(reg.coefs, dtype=np.float64),
        "reg_intercepts": np.asarray(reg.intercepts, dtype=np.float64),
        "reg_bins": np.asarray(reg.sample_bins, dtype=np.float64),
        # error predictor (per-bin sorted residuals)
        "err_bins": np.asarray(ep.partition_bins, dtype=np.float64),
        "err_labels": err_labels,
    }
    for k in err_labels:
        payload[f"err_{int(k)}"] = np.asarray(
            ep.errs[int(k)], dtype=np.float64
        )
    np.savez_compressed(path, **payload)


def load_annchor(path: str, X, func, func_kwargs=None, **kwargs):
    """Rebuild a fitted Annchor from ``path``.

    X and the metric must match what the index was built from (the
    dataset itself is not stored).  Extra kwargs are forwarded to the
    Annchor constructor.
    """
    from annchor_tpu.annchor import Annchor
    from annchor_tpu.ops import pairs as pair_ops

    z = np.load(path, allow_pickle=False)
    if int(z["format"]) != _FORMAT:
        raise ValueError(f"unsupported checkpoint format {int(z['format'])}")
    if int(z["nx"]) != len(X):
        raise ValueError(
            f"checkpoint was built from {int(z['nx'])} points, "
            f"got a dataset of {len(X)}"
        )

    ann = Annchor(
        X,
        func,
        func_kwargs=func_kwargs,
        n_anchors=int(z["n_anchors"]),
        n_neighbors=int(z["n_neighbors"]),
        locality=int(z["locality"]),
        loc_thresh=int(z["loc_thresh"]),
        is_metric=bool(z["is_metric"]),
        **kwargs,
    )
    ann.A = z["A"]
    ann.D = z["D"]
    ann.S = z["S"]
    ann.IJs = z["IJs"]
    ann.RefineApprox = z["RefineApprox"]
    ann.not_computed_mask = z["not_computed_mask"]
    ann.features = z["features"]
    ann.feature_names = [
        "lower bound", "upper bound", "double anchor distance", "is anchor",
    ]
    ann.neighbor_graph = (z["ng_i"], z["ng_d"])
    if "ng_exact" in z.files:
        ann._ng_exact = z["ng_exact"]
    ann.evals = int(z["evals"])
    ann.P_idx, ann.P_cnt = pair_ops.build_point_index(ann.IJs, ann.nx)

    reg = ann.regression
    reg.coefs = z["reg_coefs"]
    reg.intercepts = z["reg_intercepts"]
    reg.sample_bins = z["reg_bins"]
    reg.n_partitions = reg.coefs.shape[0]

    ep = ann.error_predictor
    ep.partition_bins = z["err_bins"]
    ep.n_partitions = ep.partition_bins.shape[0] - 1
    ep.labels = range(ep.n_partitions)
    ep.errs = {
        int(k): z[f"err_{int(k)}"] for k in z["err_labels"]
    }
    return ann
