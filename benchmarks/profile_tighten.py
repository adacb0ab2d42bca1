"""Stage-level timing of the scale-path bound-tightening kernel.

`_tighten_cols` (ops/device_pipeline.py) runs once per fit iteration
plus once at finalise; at nx=1e5 / m~47M the fit's stage table bills
it 14-18 s per call, but the per-iteration barrier drains deferred
async work into the same line, so this isolates the kernel: a
synthetic pair state at the real 100k shape, the full kernel, and
scatter-free variants of its internal stages.

Usage: python benchmarks/profile_tighten.py [--m 47000000 --nx 100000]
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from annchor_tpu.ops import device_pipeline as dp


def timed(fn, sync, warmup=1, reps=4):
    for _ in range(warmup):
        sync(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=47_000_000)
    ap.add_argument("--nx", type=int, default=100_000)
    ap.add_argument("--computed-frac", type=float, default=0.3)
    ap.add_argument("--ncol", type=int, default=2048)
    ap.add_argument("--cmax", type=int, default=1 << 23)
    args = ap.parse_args()

    m, nx = args.m, args.nx
    rng = np.random.default_rng(0)
    # synthetic tracked pairs: endpoints uniform, i < j, UNIQUE —
    # real tracked pair lists never repeat an (i, j), and duplicate
    # pairs make both panel builds scatter-order-dependent
    a = rng.integers(0, nx, size=int(m * 1.02) + 1024, dtype=np.int64)
    b = rng.integers(0, nx - 1, size=a.shape[0], dtype=np.int64)
    b = np.where(b >= a, b + 1, b)
    key = np.unique(np.minimum(a, b) * nx + np.maximum(a, b))
    rng.shuffle(key)
    key = key[:m]
    assert key.shape[0] == m, "raise the oversample factor"
    ij_i = jnp.asarray((key // nx).astype(np.int32))
    ij_j = jnp.asarray((key % nx).astype(np.int32))
    del a, b, key
    RA = jnp.asarray(rng.random(m, dtype=np.float32) * 100.0)
    ncm = jnp.asarray(rng.random(m) > args.computed_frac)
    lb = RA * 0.5
    ub = RA * 1.5
    thresh = jnp.asarray(
        rng.random(nx, dtype=np.float32) * 60.0 + 20.0
    )

    results = {}

    def rec(stage, best):
        results[stage] = best
        print(json.dumps({"stage": stage, "best_s": round(best, 4)}),
              flush=True)

    ncol = min(args.ncol, nx)
    cmax = int(min(args.cmax, m))

    # full kernel
    rec("tighten_cols_full", timed(
        lambda: dp._tighten_cols(
            ij_i, ij_j, RA, ncm, lb, ub, thresh, ncol, cmax
        ),
        lambda r: np.asarray(r[0][:1]),
        warmup=1, reps=3,
    ))

    # internal stages, re-created standalone (arrays passed as args so
    # they are jit parameters, not baked program constants — captured
    # device arrays blow the remote-compile request past its size cap)
    w = (~ncm).astype(jnp.int32)

    @jax.jit
    def deg_scatter(ij_i, ij_j, w):
        deg = jnp.zeros(nx, dtype=jnp.int32)
        deg = deg.at[ij_i].add(w, mode="drop")
        return deg.at[ij_j].add(w, mode="drop")

    rec("deg_scatter", timed(
        lambda: deg_scatter(ij_i, ij_j, w),
        lambda r: np.asarray(r[:1]),
    ))
    deg = deg_scatter(ij_i, ij_j, w)
    _, cols_ids = jax.lax.top_k(deg, ncol)
    col_of = jnp.full(nx, -1, dtype=jnp.int32).at[cols_ids].set(
        jnp.arange(ncol, dtype=jnp.int32)
    )

    @jax.jit
    def ev_scatter(ij_i, ij_j, RA, ncm, col_of):
        okv = ~ncm
        ci = jnp.take(col_of, ij_i)
        cj = jnp.take(col_of, ij_j)
        ci = jnp.where(okv & (ci >= 0), ci, ncol)
        cj = jnp.where(okv & (cj >= 0), cj, ncol)
        E = jnp.zeros((nx, ncol), dtype=jnp.float32)
        V = jnp.zeros((nx, ncol), dtype=bool)
        E = E.at[ij_j, ci].set(RA, mode="drop")
        E = E.at[ij_i, cj].set(RA, mode="drop")
        V = V.at[ij_j, ci].set(True, mode="drop")
        V = V.at[ij_i, cj].set(True, mode="drop")
        return E, V

    rec("EV_scatter", timed(
        lambda: ev_scatter(ij_i, ij_j, RA, ncm, col_of),
        lambda r: np.asarray(r[0][:1, :1]),
    ))
    E, V = ev_scatter(ij_i, ij_j, RA, ncm, col_of)

    @jax.jit
    def contender_ids(ij_i, ij_j, ncm, lb, thresh):
        cap = jnp.maximum(jnp.take(thresh, ij_i), jnp.take(thresh, ij_j))
        cont = ncm & (lb < cap)
        return jnp.nonzero(cont, size=cmax, fill_value=m)[0].astype(
            jnp.int32
        )

    rec("contender_nonzero", timed(
        lambda: contender_ids(ij_i, ij_j, ncm, lb, thresh),
        lambda r: np.asarray(r[:1]),
    ))
    ids = contender_ids(ij_i, ij_j, ncm, lb, thresh)

    chunk = 65536
    nchunks = (cmax + chunk - 1) // chunk
    ids_pad = jnp.pad(ids, (0, nchunks * chunk - cmax),
                      constant_values=m)
    ij_i_pad = jnp.concatenate([ij_i, jnp.zeros(1, ij_i.dtype)])
    ij_j_pad = jnp.concatenate([ij_j, jnp.zeros(1, ij_j.dtype)])
    lb_pad = jnp.concatenate([lb, jnp.zeros(1, lb.dtype)])
    ub_pad = jnp.concatenate([ub, jnp.full(1, np.inf, ub.dtype)])

    @jax.jit
    def gather_loop(ids_pad, ij_i_pad, ij_j_pad, E, V, lb_pad, ub_pad):
        def body(t, state):
            lb_acc, ub_acc = state
            sel = jax.lax.dynamic_slice(ids_pad, (t * chunk,), (chunk,))
            gi = jnp.take(ij_i_pad, sel)
            gj = jnp.take(ij_j_pad, sel)
            Ei = jnp.take(E, gi, axis=0)
            Ej = jnp.take(E, gj, axis=0)
            Vi = jnp.take(V, gi, axis=0)
            Vj = jnp.take(V, gj, axis=0)
            both = Vi & Vj
            Ei = jnp.where(Vi, Ei, np.float32(np.inf))
            Ej = jnp.where(Vj, Ej, np.float32(np.inf))
            lb_new = jnp.max(
                jnp.where(both, jnp.abs(Ei - Ej), 0.0), axis=1
            )
            ub_new = jnp.min(Ei + Ej, axis=1)
            lb_acc = lb_acc.at[sel].max(lb_new, mode="drop")
            ub_acc = ub_acc.at[sel].min(ub_new, mode="drop")
            return lb_acc, ub_acc

        return jax.lax.fori_loop(
            0, nchunks, body, (lb_pad, ub_pad)
        )

    rec("contender_gather_loop", timed(
        lambda: gather_loop(
            ids_pad, ij_i_pad, ij_j_pad, E, V, lb_pad, ub_pad
        ),
        lambda r: np.asarray(r[0][:1]),
        warmup=1, reps=3,
    ))

    # ---- candidate fixes ---------------------------------------------
    # (a) EV built from the column points' incidence rows: ncol*max_deg
    #     updates instead of 2*m
    from annchor_tpu.ops.device_pipeline import _pidx_from_pairs

    P_cnt = np.bincount(np.asarray(ij_i), minlength=nx) + np.bincount(
        np.asarray(ij_j), minlength=nx
    )
    max_deg = int(P_cnt.max())
    P_idx = _pidx_from_pairs(ij_i, ij_j, nx, max_deg)
    print(json.dumps({"max_deg": max_deg}), flush=True)

    @jax.jit
    def ev_incidence(P_idx, cols_ids, ij_i, ij_j, RA, ncm):
        RA_pad = jnp.concatenate([RA, jnp.zeros(1, RA.dtype)])
        ncm_pad = jnp.concatenate([ncm, jnp.array([True])])
        ps_pad = jnp.concatenate(
            [(ij_i + ij_j).astype(jnp.int32), jnp.zeros(1, jnp.int32)]
        )
        rows = jnp.take(P_idx, cols_ids, axis=0)  # (ncol, deg)
        good = (rows < m) & ~jnp.take(ncm_pad, rows)
        val = jnp.take(RA_pad, rows)
        partner = jnp.take(ps_pad, rows) - cols_ids[:, None]
        d_pos = jnp.arange(rows.shape[1], dtype=jnp.int32)[None, :]
        row_idx = jnp.where(good, partner, nx + d_pos)
        c_idx = jnp.broadcast_to(
            jnp.arange(ncol, dtype=jnp.int32)[:, None], rows.shape
        )
        E = jnp.zeros((nx, ncol), jnp.float32).at[row_idx, c_idx].set(
            jnp.where(good, val, 0.0), mode="drop", unique_indices=True
        )
        V = jnp.zeros((nx, ncol), bool).at[row_idx, c_idx].set(
            good, mode="drop", unique_indices=True
        )
        return E, V

    rec("EV_incidence", timed(
        lambda: ev_incidence(P_idx, cols_ids, ij_i, ij_j, RA, ncm),
        lambda r: np.asarray(r[0][:1, :1]),
    ))
    E2, V2 = ev_incidence(P_idx, cols_ids, ij_i, ij_j, RA, ncm)
    same = bool(
        jnp.array_equal(E2, E) & jnp.array_equal(V2, V)
    )
    print(json.dumps({"EV_incidence_equal": same}), flush=True)

    # (b) contender extraction as one sorted scatter-max
    @jax.jit
    def contender_sorted(ij_i, ij_j, ncm, lb, thresh):
        cap = jnp.maximum(jnp.take(thresh, ij_i), jnp.take(thresh, ij_j))
        cont = ncm & (lb < cap)
        pos = jnp.cumsum(cont.astype(jnp.int32)) - 1
        src = jnp.where(cont, jnp.arange(m, dtype=jnp.int32), -1)
        out = jnp.full(cmax, -1, jnp.int32).at[pos].max(
            src, mode="drop", indices_are_sorted=True
        )
        return jnp.where(out >= 0, out, m)

    rec("contender_sorted_scatter", timed(
        lambda: contender_sorted(ij_i, ij_j, ncm, lb, thresh),
        lambda r: np.asarray(r[:1]),
    ))
    ids2 = contender_sorted(ij_i, ij_j, ncm, lb, thresh)
    print(json.dumps({
        "contender_equal": bool(jnp.array_equal(ids2, ids))
    }), flush=True)

    # full kernel again, on the incidence fast path
    rec("tighten_cols_full_pidx", timed(
        lambda: dp._tighten_cols(
            ij_i, ij_j, RA, ncm, lb, ub, thresh, ncol, cmax,
            P_idx=P_idx,
        ),
        lambda r: np.asarray(r[0][:1]),
        warmup=1, reps=3,
    ))
    ref_full = dp._tighten_cols(
        ij_i, ij_j, RA, ncm, lb, ub, thresh, ncol, cmax
    )
    new_full = dp._tighten_cols(
        ij_i, ij_j, RA, ncm, lb, ub, thresh, ncol, cmax, P_idx=P_idx
    )
    print(json.dumps({"tighten_pidx_equal": bool(
        jnp.array_equal(ref_full[0], new_full[0])
        & jnp.array_equal(ref_full[1], new_full[1])
    )}), flush=True)

    # (c) gather loop over a single inf-encoded panel: V folded into E
    #     as +inf entries — halves the per-chunk gather traffic
    E_inf = jnp.where(V, E, np.float32(np.inf))

    @jax.jit
    def gather_loop_einf(ids_pad, ij_i_pad, ij_j_pad, E_inf,
                         lb_pad, ub_pad):
        def body(t, state):
            lb_acc, ub_acc = state
            sel = jax.lax.dynamic_slice(ids_pad, (t * chunk,), (chunk,))
            gi = jnp.take(ij_i_pad, sel)
            gj = jnp.take(ij_j_pad, sel)
            Ei = jnp.take(E_inf, gi, axis=0)
            Ej = jnp.take(E_inf, gj, axis=0)
            both = (Ei < np.float32(np.inf)) & (Ej < np.float32(np.inf))
            lb_new = jnp.max(
                jnp.where(both, jnp.abs(Ei - Ej), 0.0), axis=1
            )
            ub_new = jnp.min(Ei + Ej, axis=1)
            lb_acc = lb_acc.at[sel].max(lb_new, mode="drop")
            ub_acc = ub_acc.at[sel].min(ub_new, mode="drop")
            return lb_acc, ub_acc

        return jax.lax.fori_loop(
            0, nchunks, body, (lb_pad, ub_pad)
        )

    rec("contender_gather_loop_einf", timed(
        lambda: gather_loop_einf(
            ids_pad, ij_i_pad, ij_j_pad, E_inf, lb_pad, ub_pad
        ),
        lambda r: np.asarray(r[0][:1]),
        warmup=1, reps=3,
    ))
    r_ref = gather_loop(ids_pad, ij_i_pad, ij_j_pad, E, V,
                        lb_pad, ub_pad)
    r_new = gather_loop_einf(ids_pad, ij_i_pad, ij_j_pad, E_inf,
                             lb_pad, ub_pad)
    print(json.dumps({"gather_einf_equal": bool(
        jnp.array_equal(r_new[0], r_ref[0])
        & jnp.array_equal(r_new[1], r_ref[1])
    )}), flush=True)

    print(json.dumps({
        "metric": "tighten_profile", "m": m, "nx": nx,
        "ncol": ncol, "cmax": cmax,
        "stages": {k: round(v, 4) for k, v in results.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
