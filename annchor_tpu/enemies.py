"""Nearest-enemy graph and selective-subset instance selection
(reference annchor/annchor.py:685-940).

These are small-n host-orchestrated extras; the heavy pieces (locality
counts, features, regression predict, exact metric batches) run through
the same device kernels as fit().
"""

from __future__ import annotations

import numpy as np

from annchor_tpu.ops import pairs as pair_ops
from annchor_tpu.ops.features import anchor_membership
from annchor_tpu.ops.locality import effective_thresholds


def _shared_counts(S):
    import jax
    import jax.numpy as jnp

    Sd = jnp.asarray(S)
    return np.asarray(
        jax.lax.dot_general(
            Sd,
            Sd,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )


def get_nearest_enemies(ann, y, nn=3, loc_min=100):
    """Computes the k nearest *differently-labelled* points for each
    point; stored as ann.nearest_enemy_graph (reference
    annchor.py:685-787)."""
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

    # --- enemy candidate pairs: adaptive thresholds over enemy columns
    enemy = y[:, None] != y[None, :]
    eff_e = effective_thresholds(
        ann.S, ann.loc_thresh, loc_min, label_mask=enemy
    )
    counts_mat = _shared_counts(ann.S)
    M_e = enemy & (
        counts_mat >= np.minimum(eff_e[:, None], eff_e[None, :])
    )
    # subtract pairs already tracked by the main candidate set
    M_orig = counts_mat >= np.minimum(
        ann.loc_eff[:, None], ann.loc_eff[None, :]
    )
    np.fill_diagonal(M_orig, True)
    M_new = M_e & ~M_orig
    r, c = np.nonzero(np.triu(M_new, k=1))
    IJ_new = np.stack([r, c], axis=1).astype(np.int32)

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

    # --- refine: 50 closest predicted enemies per point
    # (reference annchor.py:753-769)
    to_refine = []
    others_cache = {}
    for i in range(nx):
        ids = ann.P_idx[i][ann.P_idx[i] < m].astype(np.int64)
        others = pair_sum[ids] - i
        others_cache[i] = (ids, others)
        emask = y[others] != y[i]
        eids = ids[emask]
        order = np.argsort(RA[eids], kind="stable")[:50]
        sel = eids[order]
        to_refine.append(sel[ncm[sel]])
    to_refine = (
        np.concatenate([t for t in to_refine if len(t)])
        if any(len(t) for t in to_refine)
        else np.zeros(0, dtype=np.int64)
    )
    if len(to_refine):
        d = ann._eval_pairs(ann.IJs[to_refine])
        RA[to_refine] = d
        ncm[to_refine] = False

    # --- assemble the enemy graph (reference annchor.py:771-787)
    ngi = np.zeros((nx, nn), dtype=np.int64)
    ngd = np.zeros((nx, nn))
    for i in range(nx):
        ids, others = others_cache[i]
        d = RA[ids].copy()
        mx = d.max() if len(d) else 0.0
        d[ncm[ids]] += mx
        d[y[others] == y[i]] += mx
        order = np.argsort(d, kind="stable")[:nn]
        ngd[i] = RA[ids[order]]
        ngi[i] = others[order]

    ann.nearest_enemy_graph = (ngi, ngd)
    return ann.nearest_enemy_graph


def _full_sorted_neighbours(ann, i, dists):
    m = ann.IJs.shape[0]
    ids = ann.P_idx[i][ann.P_idx[i] < m].astype(np.int64)
    isort = np.argsort(dists[ids], kind="stable")
    ngi = ann.IJs[ids[isort]].sum(axis=1) - i
    ngd = dists[ids][isort]
    return (
        np.insert(ngi, 0, i).astype(int),
        np.insert(ngd, 0, 0.0),
    )


def annchor_selective_subset(ann, y, dne=None, alpha=0):
    """Greedy selective subset for 1-NN classification
    (reference annchor.py:789-915)."""
    y = np.asarray(y)
    if dne is None:
        try:
            dne = ann.nearest_enemy_graph[1][:, 0]
        except AttributeError:
            get_nearest_enemies(ann, y)
            dne = ann.nearest_enemy_graph[1][:, 0]

    zero_dist = np.argwhere(dne == 0)
    if len(zero_dist) > 0:
        error = (
            "Error: The following indices are distance zero from a point "
            + " with a different label:\n"
        )
        for i in zero_dist:
            error += "\t %d\n" % i
        raise Exception(error)

    alpha_dne = dne / (1 + alpha)
    ix = np.arange(len(ann.X))
    ngi, ngd = ann.neighbor_graph

    # per point: how many of its NNs are strictly closer than its
    # nearest enemy (the "buffer")
    ebuffer = np.array(
        [
            np.searchsorted(_ngd, _dne - 1e-6)
            for _ngd, _dne in zip(ngd, alpha_dne)
        ]
    )
    buffer = [_ngi[:eb].astype(int) for _ngi, eb in zip(ngi, ebuffer)]
    rss = ix[ebuffer == 1]

    present = np.isin(ngi, rss)
    amaxpresent = np.argmax(present, axis=1)
    anypresent = np.any(present, axis=1)
    rssbuffer = amaxpresent + ebuffer * (~anypresent)
    done = np.array(rssbuffer < ebuffer)
    rest = ix[~done]

    while len(rest) > 0:
        stack = np.hstack([buffer[t] for t in ix[~done]])
        a, b = np.unique(stack, return_counts=True)
        nxt = a[np.argmax(b)]
        rss = np.append(rss, nxt)

        present = np.isin(ngi[~done], rss[-1])
        amaxpresent = np.argmax(present, axis=1)
        anypresent = np.any(present, axis=1)
        rssbuffer = amaxpresent + ebuffer[~done] * (~anypresent)
        done[~done] += rssbuffer < ebuffer[~done]
        rest = ix[~done]

    # prune pass over the *full* ordered neighbour lists
    # (reference annchor.py:876-915)
    dists = ann.RefineApprox.copy()
    iub = ann.feature_names.index("upper bound")
    dists[ann.not_computed_mask] = ann.features[
        ann.not_computed_mask, iub
    ]
    res = [_full_sorted_neighbours(ann, i, dists) for i in range(ann.nx)]
    full_ngi = [r[0] for r in res]
    full_ngd = [r[1] for r in res]
    ebuffer = np.array(
        [
            np.searchsorted(_ngd, _dne - 1e-6)
            for _ngd, _dne in zip(full_ngd, alpha_dne)
        ]
    )
    buffer = [_ngi[:eb] for _ngi, eb in zip(full_ngi, ebuffer)]
    ssarr = np.array(
        [np.isin(rss, buffer[i], assume_unique=True) for i in range(ann.nx)]
    )
    a = np.zeros(len(rss))
    j = 0
    for i in range(len(rss)):
        del_ssarr = np.delete(ssarr, i - j, axis=1)
        mmin = np.min(np.sum(del_ssarr, axis=1))
        if mmin != 0:
            ssarr = del_ssarr
            j += 1
            a[i] = 1
    return np.delete(rss, np.arange(len(rss))[a.astype(bool)])


def alpha_rss(ann, y, dne=None, alpha=0):
    """Sequential alpha-RSS subset (reference annchor.py:917-940)."""
    y = np.asarray(y)
    if dne is None:
        try:
            dne = ann.nearest_enemy_graph[1][:, 0]
        except AttributeError:
            get_nearest_enemies(ann, y)
            dne = ann.nearest_enemy_graph[1][:, 0]

    ix = np.argsort(dne, kind="stable")
    rss = [int(ix[0])]
    alpha_dne = dne / (1 + alpha)
    ann.rssDs = {}
    for i in ix:
        ds = np.asarray(
            ann.get_exact_ijs(
                ann.f, ann.X, np.array([[i, r] for r in rss])
            )
        )
        ann.rssDs[int(i)] = ds
        dnnR = np.min(ds)
        dne_alpha = alpha_dne[i]
        if (dnnR > dne_alpha) or np.isclose(dnnR, dne_alpha):
            rss.append(int(i))
    return np.array(rss)
