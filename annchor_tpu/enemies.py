"""Nearest-enemy graph and selective-subset instance selection
(reference annchor/annchor.py:685-940).

These are small-n host-orchestrated extras; the heavy pieces (locality
counts, features, regression predict, exact metric batches) run through
the same device kernels as fit().
"""

from __future__ import annotations

import numpy as np

from annchor_tpu.ops import pairs as pair_ops
from annchor_tpu.ops.locality import (
    effective_thresholds,
    enemy_candidate_pairs,
)

# row-block size for the padded-incidence passes: bounds the
# (block, max_deg) float64 temps at large nx
_ROW_BLOCK = 2048


def get_nearest_enemies(ann, y, nn=3, loc_min=100):
    """Computes the k nearest *differently-labelled* points for each
    point; stored as ann.nearest_enemy_graph (reference
    annchor.py:685-787).

    Scale-safe: the enemy candidate pairs come from the blocked device
    kernel (ops/locality.enemy_candidate_pairs) and the per-point
    refine/assembly passes run vectorised over row blocks of the padded
    incidence matrix — no (nx, nx) host matrices, no Python loop over
    points.  Fits whose state is still device-resident stay on device
    end to end (append, refine selection, assembly), so the extras
    never force the O(m) host materialisation."""
    nx = ann.nx
    y = np.asarray(y)
    assert len(y) == nx, (
        "Label dimension mismatch: len(y)=%d, len(X)=%d" % (len(y), nx)
    )
    labels, counts = np.unique(y, return_counts=True)
    assert len(labels) > 1, "Data must have more than one label"
    assert np.all(counts >= nn), (
        "At least one label occurs fewer times than specified nn=%d" % nn
    )

    if getattr(ann, "_dev", None) is not None:
        return _get_nearest_enemies_device(ann, y, nn, loc_min)

    # --- enemy candidate pairs: adaptive thresholds over enemy columns
    eff_e = effective_thresholds(
        ann.S, ann.loc_thresh, loc_min, label_neq=y
    )
    if getattr(ann, "_ij_dev", None) is not None:
        # device-built pair lists may be budget-capped (the default
        # for metric fits): "admitted by the main filter" no longer
        # implies "tracked", so generate every enemy candidate and
        # dedupe against the actual pair list explicitly
        loc_eff_excl = np.full(ann.nx, np.inf, dtype=np.float32)
    else:
        loc_eff_excl = ann.loc_eff
    IJ_new = enemy_candidate_pairs(ann.S, y, eff_e, loc_eff_excl)
    if (
        getattr(ann, "_ij_dev", None) is not None
        and IJ_new.shape[0]
    ):
        old = ann.IJs
        keys_old = old[:, 0].astype(np.int64) * nx + old[:, 1]
        keys_new = (
            IJ_new[:, 0].astype(np.int64) * nx + IJ_new[:, 1]
        )
        IJ_new = IJ_new[~np.isin(keys_new, keys_old)]

    # --- features + predicted distances for the new pairs
    fnames, feats_new, ncm_new = ann.get_features_IJ(IJ_new)
    pred = ann.regression.predict(feats_new, fnames)
    pred = np.clip(pred, feats_new[:, 0], feats_new[:, 1])

    # --- append to global state (reference annchor.py:734-742)
    ann.IJs = np.concatenate([ann.IJs, IJ_new], axis=0)
    ann.features = np.concatenate([ann.features, feats_new], axis=0)
    ann.not_computed_mask = np.concatenate(
        [ann.not_computed_mask, ncm_new]
    )
    ann.RefineApprox = np.concatenate([ann.RefineApprox, pred])
    ann.P_idx, ann.P_cnt = pair_ops.build_point_index(ann.IJs, nx)

    RA = ann.RefineApprox
    ncm = ann.not_computed_mask
    m = ann.IJs.shape[0]
    pair_sum = np.concatenate([ann.IJs.sum(axis=1), [0]]).astype(np.int64)

    # --- refine: 50 closest predicted enemies per point, row-blocked
    # (reference annchor.py:753-769)
    refine_parts = []
    for s in range(0, nx, _ROW_BLOCK):
        e = min(s + _ROW_BLOCK, nx)
        rows = ann.P_idx[s:e].astype(np.int64)  # (B, max_deg)
        valid = rows < m
        ids = np.where(valid, rows, 0)
        others = np.where(
            valid, pair_sum[ids] - np.arange(s, e)[:, None], 0
        )
        emask = valid & (y[others] != y[s:e, None])
        dmat = np.where(emask, RA[ids], np.inf)
        k = min(50, dmat.shape[1])
        order = np.argsort(dmat, axis=1, kind="stable")[:, :k]
        sel = np.take_along_axis(ids, order, axis=1)
        sel_ok = np.take_along_axis(emask, order, axis=1)
        sel = sel[sel_ok & ncm[sel]]
        if sel.size:
            refine_parts.append(sel)
    to_refine = (
        np.concatenate(refine_parts)
        if refine_parts
        else np.zeros(0, dtype=np.int64)
    )
    if len(to_refine):
        d = ann._eval_pairs(ann.IJs[to_refine])
        RA[to_refine] = d
        ncm[to_refine] = False

    # --- assemble the enemy graph, row-blocked
    # (reference annchor.py:771-787)
    ngi = np.zeros((nx, nn), dtype=np.int64)
    ngd = np.zeros((nx, nn))
    for s in range(0, nx, _ROW_BLOCK):
        e = min(s + _ROW_BLOCK, nx)
        rows = ann.P_idx[s:e].astype(np.int64)
        valid = rows < m
        ids = np.where(valid, rows, 0)
        others = np.where(
            valid, pair_sum[ids] - np.arange(s, e)[:, None], 0
        )
        dmat = np.where(valid, RA[ids], np.inf)
        mx = np.max(np.where(valid, dmat, -np.inf), axis=1, keepdims=True)
        mx = np.where(np.isfinite(mx), mx, 0.0)
        pen = (
            dmat
            + mx * (valid & ncm[ids])
            + mx * (valid & (y[others] == y[s:e, None]))
        )
        order = np.argsort(pen, axis=1, kind="stable")[:, :nn]
        ngd[s:e] = np.take_along_axis(
            np.where(valid, RA[ids], np.inf), order, axis=1
        )
        ngi[s:e] = np.take_along_axis(others, order, axis=1)

    ann.nearest_enemy_graph = (ngi, ngd)
    return ann.nearest_enemy_graph


def _get_nearest_enemies_device(ann, y, nn, loc_min):
    """Device-resident twin of the host path above: the fit state
    (lb/ub/dad/RA/ncm, pair list, incidence) stays on device; the host
    sees only the enemy candidate list, the chosen refine ids and the
    final (nx, nn) graph (VERDICT r2 next #5)."""
    dev = ann._dev
    nx = ann.nx

    eff_e = effective_thresholds(
        ann.S, ann.loc_thresh, loc_min, label_neq=y
    )
    if getattr(ann, "_ij_dev", None) is not None:
        # budget-capped builds: admitted != tracked, so generate every
        # enemy candidate and dedupe against the tracked list on device
        loc_eff_excl = np.full(nx, np.inf, dtype=np.float32)
    else:
        loc_eff_excl = ann.loc_eff
    IJ_new = enemy_candidate_pairs(ann.S, y, eff_e, loc_eff_excl)
    if (
        getattr(ann, "_ij_dev", None) is not None
        and IJ_new.shape[0]
    ):
        IJ_new = IJ_new[~dev.tracked_mask(IJ_new)]

    dev.append_pairs(IJ_new, ann.regression)

    _, codes = np.unique(y, return_inverse=True)
    ids = dev.enemy_refine_ids(codes, k=50)
    if ids.size:
        d = ann._eval_pairs(dev._pairs_at(ids))
        dev.apply_exact(ids, d)

    ann.nearest_enemy_graph = dev.enemy_knn_graph(codes, nn)
    return ann.nearest_enemy_graph


def _enemy_dists(ann, y, dne):
    """First-column enemy distances, computing the enemy graph lazily."""
    if dne is not None:
        return np.asarray(dne)
    if not hasattr(ann, "nearest_enemy_graph"):
        get_nearest_enemies(ann, np.asarray(y))
    return ann.nearest_enemy_graph[1][:, 0]


def _guard_zero_enemies(dne):
    bad = np.flatnonzero(dne == 0)
    if bad.size:
        msg = (
            "Error: The following indices are distance zero from a point "
            + " with a different label:\n"
        )
        msg += "".join("\t %d\n" % i for i in bad)
        raise Exception(msg)


def _ranked_neighbour_table(ann):
    """All candidate neighbours of every point, self-prepended and
    sorted by current best distance, as two dense (nx, 1+max_deg)
    arrays (uncomputed pairs fall back to their upper bound).

    One vectorised argsort over the padded incidence matrix replaces
    the per-point Python loop over CSR rows."""
    m = ann.IJs.shape[0]
    dists = np.where(
        ann.not_computed_mask,
        ann.features[:, ann.feature_names.index("upper bound")],
        ann.RefineApprox,
    )
    pad = ann.P_idx >= m
    ids = np.where(pad, 0, ann.P_idx).astype(np.int64)
    dmat = np.where(pad, np.inf, dists[ids])
    partners = np.where(
        pad, -1, ann.IJs[ids].sum(axis=2) - np.arange(ann.nx)[:, None]
    )
    rank = np.argsort(dmat, axis=1, kind="stable")
    tab_d = np.concatenate(
        [np.zeros((ann.nx, 1)), np.take_along_axis(dmat, rank, 1)], axis=1
    )
    tab_j = np.concatenate(
        [
            np.arange(ann.nx)[:, None],
            np.take_along_axis(partners, rank, 1),
        ],
        axis=1,
    )
    return tab_j, tab_d


def _cover_depths(tab_d, radii):
    """How many leading table entries lie strictly inside each point's
    enemy radius (rows of tab_d are ascending)."""
    return (tab_d < (radii - 1e-6)[:, None]).sum(axis=1)


def _greedy_cover(tab_j, depth, nx):
    """Minimum-ish hitting set: every point must have a chosen
    representative among the first depth[i] entries of its row.

    Flat incidence arrays + bincount tallies; each round picks the
    candidate covering the most still-uncovered points (smallest index
    on ties), identical semantics to a per-round unique/argmax scan."""
    width = tab_j.shape[1]
    live_entry = np.arange(width)[None, :] < depth[:, None]
    rows = np.nonzero(live_entry)[0]
    cands = tab_j[live_entry].astype(np.int64)

    chosen = np.flatnonzero(depth == 1)  # can only represent themselves
    member = np.zeros(nx, dtype=bool)
    member[chosen] = True
    uncovered = np.bincount(rows, weights=member[cands], minlength=nx) == 0

    picks = list(chosen)
    while uncovered.any():
        open_entry = uncovered[rows]
        tally = np.bincount(cands[open_entry], minlength=nx)
        pick = int(tally.argmax())
        picks.append(pick)
        uncovered[rows[open_entry & (cands == pick)]] = False
    return np.asarray(picks, dtype=np.int64)


def _prune_cover(subset, tab_j, depth, nx):
    """Drop subset members (in order) whose removal leaves every point
    with at least one remaining in-radius representative.  Support
    counts are maintained incrementally instead of re-summing a dense
    matrix per deletion."""
    slot = np.full(nx, -1, dtype=np.int64)
    slot[subset] = np.arange(subset.shape[0])

    width = tab_j.shape[1]
    live_entry = np.arange(width)[None, :] < depth[:, None]
    rows = np.nonzero(live_entry)[0]
    hits = slot[tab_j[live_entry].astype(np.int64)]
    rows, hits = rows[hits >= 0], hits[hits >= 0]

    incidence = np.zeros((nx, subset.shape[0]), dtype=np.int64)
    incidence[rows, hits] = 1
    return _prune_cover_incidence(subset, incidence)


def _prune_cover_incidence(subset, incidence):
    """In-order redundancy prune over a precomputed (nx, |subset|)
    0/1 cover-incidence matrix."""
    support = incidence.sum(axis=1)
    keep = np.ones(subset.shape[0], dtype=bool)
    for c in range(subset.shape[0]):
        residual = support - incidence[:, c]
        if residual.min() >= 1:
            support = residual
            keep[c] = False
    return subset[keep]


def annchor_selective_subset(ann, y, dne=None, alpha=0):
    """Selective subset for 1-NN classification: a small set of
    representatives such that every point has a representative closer
    than its nearest enemy.  Greedy max-coverage pass, then an in-order
    redundancy prune over the full candidate neighbour lists."""
    y = np.asarray(y)
    dne = _enemy_dists(ann, y, dne)
    _guard_zero_enemies(dne)
    radii = dne / (1 + alpha)

    ngi, ngd = ann.neighbor_graph
    depth_knn = _cover_depths(np.asarray(ngd), radii)
    subset = _greedy_cover(np.asarray(ngi).astype(np.int64), depth_knn, ann.nx)

    if getattr(ann, "_dev", None) is not None:
        # device-resident fits: the prune's cover incidence comes from
        # a row-blocked device pass over the tracked candidates — the
        # O(m) ranked-table host materialisation never happens
        slot = np.full(ann.nx, -1, dtype=np.int64)
        slot[subset] = np.arange(subset.shape[0])
        incidence = ann._dev.cover_incidence(slot, radii)
        # every subset member covers itself (the host table's
        # self-prepended column 0)
        incidence[subset, np.arange(subset.shape[0])] = 1
        return _prune_cover_incidence(subset, incidence)

    tab_j, tab_d = _ranked_neighbour_table(ann)
    depth_full = _cover_depths(tab_d, radii)
    return _prune_cover(subset, tab_j, depth_full, ann.nx)


def alpha_rss(ann, y, dne=None, alpha=0, block=64):
    """Sequential alpha-RSS subset: visit points by ascending enemy
    distance; a point joins the subset unless it is already within its
    own (alpha-shrunk) enemy radius of an existing member.

    The decision loop is inherently sequential (each admission changes
    later tests), but the metric evaluation is batched: candidates are
    processed in blocks, each block's distances to all *pre-block*
    members land in one dispatch, and only distances to members
    admitted within the same block need small follow-up batches —
    O(nx/block + admissions) dispatches instead of O(nx) (the reference
    is equally sequential, annchor.py:917-940, but its per-call cost is
    microseconds, not a device round trip)."""
    y = np.asarray(y)
    dne = _enemy_dists(ann, y, dne)
    radii = dne / (1 + alpha)

    visit = np.argsort(dne, kind="stable")
    members = [int(visit[0])]
    ann.rssDs = {}
    for s in range(0, len(visit), block):
        blk = visit[s : s + block]
        base = list(members)  # members admitted before this block
        if base:
            pairs = np.stack(
                [
                    np.repeat(blk, len(base)),
                    np.tile(base, len(blk)),
                ],
                axis=1,
            ).astype(np.int64)
            gaps_blk = np.asarray(
                ann.get_exact_ijs(ann.f, ann.X, pairs)
            ).reshape(len(blk), len(base))
        else:
            gaps_blk = np.zeros((len(blk), 0))
        for t, cand in enumerate(blk):
            gaps = gaps_blk[t]
            fresh = members[len(base) :]  # admitted within this block
            if fresh:
                extra_pairs = np.column_stack(
                    [np.full(len(fresh), cand), fresh]
                ).astype(np.int64)
                gaps = np.concatenate(
                    [
                        gaps,
                        np.asarray(
                            ann.get_exact_ijs(ann.f, ann.X, extra_pairs)
                        ),
                    ]
                )
            ann.rssDs[int(cand)] = gaps
            nearest = gaps.min()
            if nearest > radii[cand] or np.isclose(nearest, radii[cand]):
                members.append(int(cand))
    return np.asarray(members)
