"""Candidate-pair generation from anchor localities.

The reference computes, for every point, the set of its `locality`
nearest anchors, then admits pair (i, j) as a k-NN candidate iff the
two sets share enough anchors — with a per-row adaptive threshold that
guarantees at least `loc_min` candidates per point, and a final
symmetrisation (reference annchor/annchor.py:208-256,
annchor/utils.py:437-491).

TPU formulation: the shared-anchor count matrix is a binary matmul
S @ S.T (MXU-native); per-row adaptive thresholds come from
`lax.top_k`; the symmetrised candidate test collapses to

    counts[i, j] >= min(eff[i], eff[j])          (i < j)

because counts is symmetric and the reference unions row-wise sets.
Everything is evaluated in row blocks so nx >> 10^4 never materialises
an nx x nx matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from annchor_tpu.ops.features import anchor_membership


@functools.partial(jax.jit, static_argnames=("loc_min",))
def _row_block_counts_and_kth(S, S_block, loc_min: int, mask_cols=None):
    """counts for a block of rows + each row's (loc_min+1)-th largest."""
    counts = jax.lax.dot_general(
        S_block,
        S,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, nx)
    cvals = counts if mask_cols is None else jnp.where(mask_cols, counts, -1.0)
    k = min(loc_min, cvals.shape[1] - 1)
    topk, _ = jax.lax.top_k(cvals, k + 1)
    return counts, topk[:, k]


def effective_thresholds(
    S, loc_thresh: float, loc_min: int, block: int = 4096, label_mask=None
):
    """Per-row effective threshold eff[i] = min(loc_thresh, kth_largest_i).

    label_mask: optional (nx, nx)-broadcastable bool restricting which
    columns count toward the loc_min guarantee (used by the
    nearest-enemy path, reference annchor.py:713-717).
    """
    nx = S.shape[0]
    eff = np.zeros(nx, dtype=np.float32)
    S = jnp.asarray(S)
    for s in range(0, nx, block):
        e = min(s + block, nx)
        mask_cols = None if label_mask is None else jnp.asarray(label_mask[s:e])
        _, kth = _row_block_counts_and_kth(S, S[s:e], loc_min, mask_cols)
        eff[s:e] = np.asarray(kth)
    return np.minimum(np.float32(loc_thresh), eff)


def candidate_pairs(
    D,
    locality: int,
    loc_thresh: int,
    loc_min: int,
    block: int = 4096,
):
    """Symmetrised candidate pair list from anchor distances.

    Returns (IJs int32 (m, 2) with IJs[:,0] < IJs[:,1], sid, S, eff).
    sid: (nx, locality) nearest-anchor ids (reference self.sid);
    S: binary membership matrix (transpose of reference Amatrix).
    """
    S, sid = anchor_membership(D, locality)
    nx = S.shape[0]
    eff = effective_thresholds(S, loc_thresh, loc_min, block=block)
    eff_j = jnp.asarray(eff)

    rows_out, cols_out = [], []
    for s in range(0, nx, block):
        e = min(s + block, nx)
        counts, _ = _row_block_counts_and_kth(S, S[s:e], loc_min)
        thr = jnp.minimum(eff_j[s:e, None], eff_j[None, :])
        keep = counts >= thr
        # upper triangle only (i < j), global indices
        col_ids = jnp.arange(nx)[None, :]
        row_ids = jnp.arange(s, e)[:, None]
        keep = keep & (col_ids > row_ids)
        r, c = np.nonzero(np.asarray(keep))
        rows_out.append((r + s).astype(np.int32))
        cols_out.append(c.astype(np.int32))
    I = np.concatenate(rows_out) if rows_out else np.zeros(0, np.int32)
    J = np.concatenate(cols_out) if cols_out else np.zeros(0, np.int32)
    IJs = np.stack([I, J], axis=1)
    return IJs, np.asarray(sid), np.asarray(S), eff


def query_candidates(S_X, QD, locality: int, loc_thresh: int):
    """Candidate database points for each query (reference
    get_query_locality, query_functions.py:18-37): counts of shared
    anchors between query q's nearest-anchor set and each database
    point's set; no adaptive threshold, no symmetrisation.

    Returns a list of np arrays (candidate indices per query).
    """
    Sq, _ = anchor_membership(QD, locality)
    counts = np.asarray(
        jax.lax.dot_general(
            jnp.asarray(Sq),
            jnp.asarray(S_X),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )
    return [np.nonzero(row >= loc_thresh)[0] for row in counts]
