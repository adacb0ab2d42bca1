"""Pallas TPU kernel for bit-parallel (Myers) batched edit distance.

The XLA formulation (levenshtein_myers._myers_batch) lays tensors out
as (B, W): with W ≈ 19 words the minor axis fills 19/128 lanes, and
every loop-carried array streams through HBM.  This kernel transposes
to (W, T) — pairs on the lane axis, words on sublanes — so every
vector op runs at full lane utilisation, and keeps the entire working
set (bitplane tables, text ids, VP/VN state) resident in VMEM for the
whole text loop:

    grid = (num_tiles,), tile = T pairs
    planes  (K, 2, W, T) uint32   bitplane Peq tables, transposed
    text    (L, T)       int32    text symbol ids, transposed
    state   VP, VN (W, T); score/result (1, T)

Per text character: Eq via K bitplane selects (no gather), the Myers
update with word-axis shifts/carries along sublanes, and a masked
score tap.  The multi-word carry of (Eq & VP) + VP uses the same
Kogge–Stone scan as the XLA kernel, on (W, T) blocks.

VMEM budget at T=1024, W<=20, K=5, L=640:
    planes 5*2*20*1024*4 = 0.8 MB   text 640*1024*4 = 2.6 MB
    state ~0.3 MB                    total well under the ~16 MB/core.

Replaces the reference's python-Levenshtein C extension hot loop
(reference annchor/distances.py:16-20, utils.py:144-177) as the
fastest of the three kernel tiers (row-DP -> XLA Myers -> Pallas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from annchor_tpu.ops._backend import pallas_interpret

UINT1 = np.uint32(1)
UFULL = np.uint32(0xFFFFFFFF)

TILE = 1024  # max pairs per grid program (lane-axis width)


def _tile_for(K: int, W: int, L: int) -> int:
    """Largest power-of-two lane width (<= TILE, >= 128) whose blocks
    fit the ~16 MB scoped VMEM: the pipeline double-buffers the
    planes (K,2,W,T) and text (L,T) input blocks, and the kernel
    carries ~6 (W,T) state/temp arrays plus a few (1,T) rows.  Long
    strings (large L, W) previously OOM'd the fixed T=1024 tile:
    'Scoped allocation ... exceeded scoped vmem limit' at length 1600."""
    budget = 13 * 1024 * 1024
    per_lane = 4 * (2 * (K * 2 * W + L) + 6 * W + 8)
    t = TILE
    while t > 128 and t * per_lane > budget:
        t //= 2
    return t


def _kernel(planes_ref, text_ref, la_ref, lb_ref, maxlb_ref, out_ref):
    K = planes_ref.shape[0]
    W = planes_ref.shape[2]
    T = planes_ref.shape[3]

    la = la_ref[0, :]  # (T,) int32
    lb = lb_ref[0, :]

    word_ids = jax.lax.broadcasted_iota(jnp.int32, (W, T), 0)

    # VP0: first la bits set (bit b of word w = pattern position 32w+b)
    nbits = jnp.clip(la[None, :] - word_ids * 32, 0, 32)
    VP0 = jnp.where(
        nbits >= 32, UFULL, (UINT1 << nbits.astype(jnp.uint32)) - UINT1
    ).astype(jnp.uint32)
    VN0 = jnp.zeros((W, T), dtype=jnp.uint32)

    # score tap: one-hot word mask holding bit (la-1)
    m1 = jnp.maximum(la - 1, 0)
    tap = jnp.where(
        word_ids == (m1 >> 5)[None, :],
        (UINT1 << (m1 & 31).astype(jnp.uint32))[None, :],
        jnp.uint32(0),
    )

    score0 = la
    result0 = jnp.where(la == 0, lb, 0)

    def shift1(x, fill):
        # one-bit left shift across words (words on axis 0)
        hi = x >> 31
        carry = jnp.concatenate([fill, hi[:-1, :]], axis=0)
        return (x << 1) | carry

    ones_row = jnp.full((1, T), UINT1, dtype=jnp.uint32)
    zero_row = jnp.zeros((1, T), dtype=jnp.uint32)

    def add_carry(x, y):
        s = x + y
        g = (s < x).astype(jnp.uint32)
        p = (s == UFULL).astype(jnp.uint32)
        G, P = g, p
        k = 1
        while k < W:
            Gs = jnp.concatenate(
                [jnp.zeros((k, T), jnp.uint32), G[:-k, :]], axis=0
            )
            Ps = jnp.concatenate(
                [jnp.full((k, T), UINT1, jnp.uint32), P[:-k, :]], axis=0
            )
            G = G | (P & Gs)
            P = P & Ps
            k *= 2
        carry_in = jnp.concatenate(
            [jnp.zeros((1, T), jnp.uint32), G[:-1, :]], axis=0
        )
        return s + carry_in

    L = text_ref.shape[0]

    def step(j, VP, VN, score, result):
        cj = text_ref[jnp.minimum(j, L - 1), :]  # (T,) int32
        cju = cj.astype(jnp.uint32)
        Eq = None
        for k in range(K):
            bit = ((cju >> k) & UINT1)[None, :]
            sel = jnp.where(
                bit == 1, planes_ref[k, 1], planes_ref[k, 0]
            )
            Eq = sel if Eq is None else (Eq & sel)
        Eq = jnp.where(cj[None, :] >= 0, Eq, jnp.uint32(0))

        Xv = Eq | VN
        D0 = (add_carry(Eq & VP, VP) ^ VP) | Xv
        HP = VN | ~(D0 | VP)
        HN = VP & D0

        hp_hit = jnp.max(jnp.where((HP & tap) != 0, 1, 0), axis=0)
        hn_hit = jnp.max(jnp.where((HN & tap) != 0, 1, 0), axis=0)
        inc = hp_hit - hn_hit
        active = (j < lb) & (la > 0)
        score = score + jnp.where(active, inc, 0)
        result = jnp.where((j == lb - 1) & (la > 0), score, result)

        X = shift1(HP, ones_row)
        HNs = shift1(HN, zero_row)
        VP = HNs | ~(D0 | X)
        VN = X & D0
        return VP, VN, score, result

    # two text characters per trip: per-step vector work is small, so
    # loop-step overhead bounds the kernel; score/result are masked by
    # `active`, so the odd overshoot step is harmless
    def body(t, carry):
        carry = step(t * 2, *carry)
        return step(t * 2 + 1, *carry)

    max_lb = maxlb_ref[0, 0]
    _, _, _, result = jax.lax.fori_loop(
        0, (max_lb + 1) // 2, body, (VP0, VN0, score0, result0)
    )
    out_ref[0, :] = result


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_batch(planes, text, la, lb, maxlb, interpret: bool):
    """planes (K,2,W,B), text (L,B), la/lb (1,B), maxlb (1,1) -> (1,B).
    B must be a multiple of the VMEM-fitted tile (every power-of-two
    tile <= TILE divides the TILE-padded batches the callers build)."""
    K, _, W, B = planes.shape
    L = text.shape[0]
    tile = _tile_for(K, W, L)
    grid = (B // tile,)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (K, 2, W, tile),
                lambda i: (0, 0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (L, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(planes, text, la, lb, maxlb)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_pairs_dev(planes_tab, ids_tab, lengths, I, J, interpret: bool):
    """Device-id pair eval: length lookup, shorter-pattern swap, the
    lane-major gather and the kernel all in one dispatch chain — no
    host hop between a selection program and the distances landing.
    B = len(I) must be a multiple of TILE (caller pads)."""
    la = jnp.take(lengths, I)
    lb = jnp.take(lengths, J)
    swap = la > lb
    P = jnp.where(swap, J, I)
    T = jnp.where(swap, I, J)
    la2 = jnp.minimum(la, lb).astype(jnp.int32)
    lb2 = jnp.maximum(la, lb).astype(jnp.int32)
    planes, text = _gather_transpose(planes_tab, ids_tab, P, T)
    maxlb = jnp.max(lb2).reshape(1, 1)
    return _pallas_batch(
        planes, text, la2[None, :], lb2[None, :], maxlb, interpret
    )[0]


def pallas_myers_pairs_dev(enc, I, J):
    """Pallas device-id twin of pallas_myers_pairs (see
    _pallas_pairs_dev).  I, J device int32, len multiple of TILE."""
    from annchor_tpu.ops._backend import pallas_interpret

    _, planes_d, ids_d, lengths_d = enc.device_arrays()
    return _pallas_pairs_dev(
        planes_d, ids_d, lengths_d, I, J, pallas_interpret()
    )


def _gather_transpose(planes_tab, ids_tab, Pi, Ti):
    """Device-side gather of pair rows + transpose to lane-major."""
    pl_b = jnp.take(planes_tab, Pi, axis=2)  # (K, 2, B, W)
    planes = jnp.transpose(pl_b, (0, 1, 3, 2))  # (K, 2, W, B)
    text = jnp.take(ids_tab, Ti, axis=0).T  # (L, B)
    return planes, text


_gather_transpose_jit = jax.jit(_gather_transpose)


def pallas_myers_pairs(enc, I, J, block_size: int = 8192):
    """Drop-in equivalent of myers_pairs using the Pallas kernel.

    enc: MyersEncoding.  Falls back to interpret mode off-TPU so the
    same code path is testable on CPU CI.
    """
    I = np.asarray(I, dtype=np.int64)
    J = np.asarray(J, dtype=np.int64)
    m = I.shape[0]
    if m == 0:
        return np.zeros(0, dtype=np.int32)
    lengths = enc.lengths
    la = lengths[I]
    lb = lengths[J]
    swap = la > lb
    P = np.where(swap, J, I)
    T = np.where(swap, I, J)
    la, lb = np.minimum(la, lb), np.maximum(la, lb)

    block_size = max(TILE, (block_size // TILE) * TILE)
    order = (
        np.argsort(la, kind="stable") if m > block_size else np.arange(m)
    )
    interp = pallas_interpret()
    _, planes_d, ids_d, _ = enc.device_arrays()
    out = np.zeros(m, dtype=np.int32)
    # async dispatch per block, single flush at the end (a blocking
    # download per block costs one relay round trip each — see
    # myers_pairs for the measured wall this avoids)
    pending = []
    for s in range(0, m, block_size):
        sel = order[s : s + block_size]
        bsz = sel.shape[0]
        pad = (-bsz) % TILE
        gp = np.concatenate([P[sel], np.zeros(pad, np.int64)])
        gt = np.concatenate([T[sel], np.zeros(pad, np.int64)])
        gla = np.concatenate([la[sel], np.zeros(pad, np.int32)])
        glb = np.concatenate([lb[sel], np.zeros(pad, np.int32)])
        planes, text = _gather_transpose_jit(
            planes_d, ids_d, jnp.asarray(gp), jnp.asarray(gt)
        )
        d = _pallas_batch(
            planes,
            text,
            jnp.asarray(gla[None, :]),
            jnp.asarray(glb[None, :]),
            jnp.asarray(np.array([[max(int(glb.max()), 0)]], np.int32)),
            interp,
        )
        pending.append((sel, bsz, d[0, : bsz + pad]))
    if len(pending) == 1:
        sel, bsz, d = pending[0]
        out[sel] = np.asarray(d)[:bsz]
    elif pending:
        flat = np.asarray(jnp.concatenate([d for _, _, d in pending]))
        off = 0
        for sel, bsz, d in pending:
            out[sel] = flat[off : off + bsz]
            off += int(d.shape[0])
    return out
