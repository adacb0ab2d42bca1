"""Checkpoint / resume for fitted indexes.

The reference keeps all state as plain attributes on the Annchor
object and offers no persistence (SURVEY.md §5: "Checkpoint/resume:
none").  Rebuilding a graph costs real metric-call budget, so this
framework adds an explicit save/load.  Two formats:

* **v1** (small fits): everything including the O(m) per-pair arrays
  (`IJs`, `features`, `RefineApprox`) — a loaded index is
  indistinguishable from the fitted one, including the
  instance-selection extras.
* **v2** (scale-path fits, chosen automatically): the whole point of
  the sparse device pipeline is that O(m) state never exists on the
  host, so the checkpoint stores only the compact serving state —
  anchor columns `D`, locality by-products, the fitted regression and
  error model, the graph with per-edge exactness, and (optionally)
  the exact store as canonical (i*nx+j) keyed values.  Everything
  `query()` / `refine_neighbor_graph()` / `to_sparse_matrix()` need;
  the device pair list is rebuilt from `D` on request
  (``load(..., rebuild_pairs=True)``) at zero metric-call cost.

The dataset and metric (which may be an arbitrary callable) are
re-supplied by the caller at load time in both formats.
"""

from __future__ import annotations

import numpy as np

__all__ = ["save_annchor", "load_annchor"]

_FORMAT = 1
_FORMAT_SPARSE = 2


def _model_payload(ann):
    """Fitted regression + error-model state (shared by both formats)."""
    reg = ann.regression
    ep = ann.error_predictor
    err_labels = np.array(sorted(ep.errs.keys()), dtype=np.int64)
    payload = {
        "reg_coefs": np.asarray(reg.coefs, dtype=np.float64),
        "reg_intercepts": np.asarray(reg.intercepts, dtype=np.float64),
        "reg_bins": np.asarray(reg.sample_bins, dtype=np.float64),
        "err_bins": np.asarray(ep.partition_bins, dtype=np.float64),
        "err_labels": err_labels,
    }
    for k in err_labels:
        payload[f"err_{int(k)}"] = np.asarray(
            ep.errs[int(k)], dtype=np.float64
        )
    return payload


def _restore_models(ann, z):
    reg = ann.regression
    reg.coefs = z["reg_coefs"]
    reg.intercepts = z["reg_intercepts"]
    reg.sample_bins = z["reg_bins"]
    reg.n_partitions = reg.coefs.shape[0]

    ep = ann.error_predictor
    ep.partition_bins = z["err_bins"]
    ep.n_partitions = ep.partition_bins.shape[0] - 1
    ep.labels = range(ep.n_partitions)
    ep.errs = {int(k): z[f"err_{int(k)}"] for k in z["err_labels"]}


def _common_payload(ann, fmt):
    payload = {
        "format": np.int64(fmt),
        "nx": np.int64(ann.nx),
        "n_anchors": np.int64(ann.n_anchors),
        "n_neighbors": np.int64(ann.n_neighbors),
        "locality": np.int64(ann.locality),
        "loc_thresh": np.int64(ann.loc_thresh),
        "is_metric": np.bool_(ann.is_metric),
        "evals": np.int64(ann.evals),
        "scout_evals": np.int64(getattr(ann, "scout_evals", 0)),
        "A": np.asarray(ann.A, dtype=np.int64),
        "D": np.asarray(ann.D, dtype=np.float64),
        "ng_i": np.asarray(ann.neighbor_graph[0], dtype=np.int64),
        "ng_d": np.asarray(ann.neighbor_graph[1], dtype=np.float64),
        # per-edge exactness (additive): lets a loaded index run
        # refine_neighbor_graph's certify pass correctly
        "ng_exact": np.asarray(
            getattr(ann, "_ng_exact", None)
            if getattr(ann, "_ng_exact", None) is not None
            else np.ones_like(ann.neighbor_graph[0], dtype=bool)
        ),
        # pair-build / budget knobs: load(..., rebuild_pairs=True)
        # must rebuild the SAME pair list the fit tracked, and the
        # post-load refine/query budget defaults key off p_work —
        # without these a loaded index would silently rebuild under
        # ctor defaults (caller kwargs still win at load)
        "p_work": np.float64(ann.p_work),
        "refine_frac": np.float64(ann.refine_frac),
        "loc_min": np.int64(ann.loc_min),
        "n_samples": np.int64(ann.n_samples),
        "pair_cap": np.int64(
            -1 if ann.pair_cap is None else ann.pair_cap
        ),
        "pair_cap_factor": np.float64(
            np.nan if ann.pair_cap_factor is None else ann.pair_cap_factor
        ),
        "max_resident_pairs": np.int64(
            -1 if ann.max_resident_pairs is None
            else ann.max_resident_pairs
        ),
    }
    payload.update(_model_payload(ann))
    return payload


def save_annchor(ann, path: str, include_exact: bool = True) -> None:
    """Persist a fitted Annchor index to ``path`` (.npz).

    Scale-path fits (sparse device pipeline) are saved in format v2,
    which never materialises the O(m) pair arrays on the host —
    `include_exact=False` additionally drops the exact-store dump
    (the computed distances beyond the reported graph) for the
    smallest possible file.
    """
    if ann.neighbor_graph is None:
        raise ValueError("save_annchor: fit() has not been run")
    dev = getattr(ann, "_dev", None)
    sparse = dev is not None and getattr(dev, "sparse", False)
    if not sparse:
        payload = _common_payload(ann, _FORMAT)
        payload.update({
            "S": np.asarray(ann.S, dtype=np.float32),
            "IJs": np.asarray(ann.IJs, dtype=np.int32),
            "RefineApprox": np.asarray(ann.RefineApprox, dtype=np.float64),
            "not_computed_mask": np.asarray(ann.not_computed_mask),
            "features": np.asarray(ann.features, dtype=np.float64),
        })
        np.savez_compressed(path, **payload)
        return

    payload = _common_payload(ann, _FORMAT_SPARSE)
    payload["S"] = np.asarray(ann.S, dtype=np.float32)
    payload["sid"] = np.asarray(ann.sid, dtype=np.int32)
    payload["loc_eff"] = np.asarray(ann.loc_eff, dtype=np.int32)
    if include_exact and getattr(dev, "exact", None) is not None:
        store = dev.exact
        if store.ids.shape[0]:
            # canonical (min*nx + max) keys survive a pair-list
            # rebuild on any backend (pair-row ids would not)
            IJ = np.asarray(dev._pairs_at(store.ids), dtype=np.int64)
            keys = (
                np.minimum(IJ[:, 0], IJ[:, 1]) * ann.nx
                + np.maximum(IJ[:, 0], IJ[:, 1])
            )
            order = np.argsort(keys, kind="stable")
            payload["exact_keys"] = keys[order]
            payload["exact_vals"] = store.vals[order]
    np.savez_compressed(path, **payload)


def load_annchor(path: str, X, func, func_kwargs=None,
                 rebuild_pairs: bool = False, **kwargs):
    """Rebuild a fitted Annchor from ``path``.

    X and the metric must match what the index was built from (the
    dataset itself is not stored).  Extra kwargs are forwarded to the
    Annchor constructor.  For format-v2 (scale path) checkpoints,
    ``rebuild_pairs=True`` re-runs the device pair build from the
    stored anchor columns (no metric calls) so pair-level state
    (`IJs`, `P_cnt`) is available again.
    """
    from annchor_tpu.annchor import Annchor
    from annchor_tpu.ops import pairs as pair_ops

    z = np.load(path, allow_pickle=False)
    fmt = int(z["format"])
    if fmt not in (_FORMAT, _FORMAT_SPARSE):
        raise ValueError(f"unsupported checkpoint format {fmt}")
    if int(z["nx"]) != len(X):
        raise ValueError(
            f"checkpoint was built from {int(z['nx'])} points, "
            f"got a dataset of {len(X)}"
        )

    # persisted fit/build knobs first, explicit caller kwargs win
    ctor = {}
    if "p_work" in z.files:
        ctor["p_work"] = float(z["p_work"])
        ctor["refine_frac"] = float(z["refine_frac"])
        ctor["loc_min"] = int(z["loc_min"])
        ctor["n_samples"] = int(z["n_samples"])
        if int(z["pair_cap"]) >= 0:
            ctor["pair_cap"] = int(z["pair_cap"])
        if np.isfinite(float(z["pair_cap_factor"])):
            ctor["pair_cap_factor"] = float(z["pair_cap_factor"])
        if int(z["max_resident_pairs"]) >= 0:
            ctor["max_resident_pairs"] = int(z["max_resident_pairs"])
    ctor.update(kwargs)
    ann = Annchor(
        X,
        func,
        func_kwargs=func_kwargs,
        n_anchors=int(z["n_anchors"]),
        n_neighbors=int(z["n_neighbors"]),
        locality=int(z["locality"]),
        loc_thresh=int(z["loc_thresh"]),
        is_metric=bool(z["is_metric"]),
        **ctor,
    )
    ann.A = z["A"]
    ann.D = z["D"]
    ann.S = z["S"]
    ann.neighbor_graph = (z["ng_i"], z["ng_d"])
    if "ng_exact" in z.files:
        ann._ng_exact = z["ng_exact"]
    ann.evals = int(z["evals"])
    if "scout_evals" in z.files:
        ann.scout_evals = int(z["scout_evals"])
    ann.feature_names = [
        "lower bound", "upper bound", "double anchor distance", "is anchor",
    ]
    _restore_models(ann, z)

    if fmt == _FORMAT:
        ann.IJs = z["IJs"]
        ann.RefineApprox = z["RefineApprox"]
        ann.not_computed_mask = z["not_computed_mask"]
        ann.features = z["features"]
        ann.P_idx, ann.P_cnt = pair_ops.build_point_index(ann.IJs, ann.nx)
        return ann

    # v2: compact serving state only
    ann.sid = z["sid"]
    ann.loc_eff = z["loc_eff"]
    if "exact_keys" in z.files:
        ann._exact_keys = z["exact_keys"]
        ann._exact_vals = z["exact_vals"]
    if rebuild_pairs:
        ann.get_locality()
    return ann
