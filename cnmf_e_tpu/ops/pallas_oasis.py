"""Pallas TPU kernel for batched OASIS AR(1) pool merging.

The OASIS event loop (``oasisAR1.m:59-109``) is inherently sequential per
trace. The XLA formulation (ops/oasis.py) vmaps a ``lax.while_loop`` whose
per-iteration cost is dominated by kernel-launch latency on TPU (~0.1 ms x
~2T iterations). This kernel runs the ENTIRE event loop inside one Pallas
program: per-iteration cost drops to VMEM-speed vector ops.

Design:
  * traces ride the lane axis (B = 128 per grid step); the pool stack is a
    set of (T, B) VMEM arrays, one column per trace
  * the TOP TWO pools of every lane's stack live in loop-carry vector
    registers; VMEM is touched only when a push spills the old
    second-from-top (masked one-hot row write) or a merge refills it
    (masked one-hot row read) — per-lane row indices make these full-array
    masked ops, but they run at VMEM bandwidth
  * the outer loop is synchronized on the sample index t (every lane pushes
    sample t together — a free scalar-indexed row read), and an inner
    ``while_loop`` merges, per-lane masked, until no lane violates; this is
    exactly the per-trace sequential algorithm, run in lockstep
  * pool -> trace reconstruction is vectorized jnp outside the kernel

VMEM budget: 6 state/output arrays x T x 128 x 4 B — T up to ~4000 fits the
~16 MB/core budget; longer traces fall back to the XLA divide-and-conquer
path (ops/oasis.py handles dispatch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _oasis_kernel(T, B):
    def kernel(vinit_ref, g_ref, smin_ref, v_ref, w_ref, ts_ref, ln_ref,
               n_ref):
        g = g_ref[0, :]                      # (B,)
        smin = smin_ref[0, :]
        logg = jnp.log(jnp.maximum(g, 1e-10))
        rowid = jax.lax.broadcasted_iota(jnp.int32, (T, B), 0)

        # stack slots 0..n-3 live in VMEM; slots n-2 (sec) and n-1 (top)
        # live in registers. All (B,) vectors.
        zf = jnp.zeros((B,), jnp.float32)
        zi = jnp.zeros((B,), jnp.int32)

        v_ref[:, :] = jnp.zeros((T, B), jnp.float32)
        w_ref[:, :] = jnp.ones((T, B), jnp.float32)
        ts_ref[:, :] = jnp.zeros((T, B), jnp.int32)
        ln_ref[:, :] = jnp.zeros((T, B), jnp.int32)

        def spill(ref, val, depth, do):
            m = (rowid == depth[None, :]) & do[None, :]
            ref[:, :] = jnp.where(m, val[None, :].astype(ref.dtype),
                                  ref[:, :])

        def fill(ref, depth):
            m = rowid == depth[None, :]
            return jnp.sum(jnp.where(m, ref[:, :], 0), axis=0)

        def violated(c):
            vt, wt, tt, lt, vs, ws, tss, ls, n = c
            vp = jnp.maximum(vs / ws, 0.0)
            gl = jnp.exp(logg * ls.astype(jnp.float32))
            return (n >= 2) & (vt / wt < vp * gl + smin)

        def merge_all(carry):
            def cond(c):
                return jnp.sum(violated(c).astype(jnp.int32)) > 0

            def body(c):
                vt, wt, tt, lt, vs, ws, tss, ls, n = c
                do = violated(c)
                gl = jnp.exp(logg * ls.astype(jnp.float32))
                # merged pool (becomes the new top)
                vm = vs + vt * gl
                wm = ws + wt * gl * gl
                lm = ls + lt
                # refill second-from-top from VMEM slot n-3
                d3 = jnp.maximum(n - 3, 0)
                vf = fill(v_ref, d3)
                wf = fill(w_ref, d3)
                tf = fill(ts_ref, d3)
                lf = fill(ln_ref, d3)
                vt = jnp.where(do, vm, vt)
                wt = jnp.where(do, wm, wt)
                tt = jnp.where(do, tss, tt)
                lt = jnp.where(do, lm, lt)
                has3 = do & (n >= 3)
                vs = jnp.where(has3, vf, vs)
                ws = jnp.where(has3, jnp.maximum(wf, 1e-20), ws)
                tss = jnp.where(has3, tf, tss)
                ls = jnp.where(has3, lf, ls)
                n = jnp.where(do, n - 1, n)
                return (vt, wt, tt, lt, vs, ws, tss, ls, n)

            return jax.lax.while_loop(cond, body, carry)

        def push_t(t, carry):
            vt, wt, tt, lt, vs, ws, tss, ls, n = carry
            # spill old second-from-top to VMEM slot n-2
            do = n >= 2
            d2 = jnp.maximum(n - 2, 0)
            spill(v_ref, vs, d2, do)
            spill(w_ref, ws, d2, do)
            spill(ts_ref, tss, d2, do)
            spill(ln_ref, ls, d2, do)
            ynew = vinit_ref[t, :]
            carry = (ynew, jnp.ones((B,), jnp.float32),
                     jnp.full((B,), t, jnp.int32),
                     jnp.ones((B,), jnp.int32),
                     vt, wt, tt, lt, n + 1)
            return merge_all(carry)

        carry0 = (zf, jnp.ones((B,), jnp.float32), zi, zi,
                  zf, jnp.ones((B,), jnp.float32), zi, zi, zi)
        vt, wt, tt, lt, vs, ws, tss, ls, n = jax.lax.fori_loop(
            0, T, push_t, carry0)

        # drain the register slots back into VMEM
        spill(v_ref, vs, jnp.maximum(n - 2, 0), n >= 2)
        spill(w_ref, ws, jnp.maximum(n - 2, 0), n >= 2)
        spill(ts_ref, tss, jnp.maximum(n - 2, 0), n >= 2)
        spill(ln_ref, ls, jnp.maximum(n - 2, 0), n >= 2)
        spill(v_ref, vt, jnp.maximum(n - 1, 0), n >= 1)
        spill(w_ref, wt, jnp.maximum(n - 1, 0), n >= 1)
        spill(ts_ref, tt, jnp.maximum(n - 1, 0), n >= 1)
        spill(ln_ref, lt, jnp.maximum(n - 1, 0), n >= 1)
        n_ref[:, :] = jnp.broadcast_to(n[None, :], (8, B))

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _oasis_pools_pallas(vinit: jnp.ndarray, g: jnp.ndarray,
                        smin: jnp.ndarray, interpret: bool = False):
    """Run the pool-merge kernel. vinit: (Kp, T) lambda-adjusted traces with
    Kp a multiple of 128 and T a multiple of 8. Returns per-trace pool
    arrays (v, w, ts, ln) each (Kp, T) and counts n (Kp,)."""
    Kp, T = vinit.shape
    B = 128
    grid = (Kp // B,)
    vin = vinit.T                                         # (T, Kp)
    g2 = jnp.broadcast_to(g[None, :], (8, Kp)).astype(jnp.float32)
    s2 = jnp.broadcast_to(smin[None, :], (8, Kp)).astype(jnp.float32)
    out_shapes = [
        jax.ShapeDtypeStruct((T, Kp), jnp.float32),       # v
        jax.ShapeDtypeStruct((T, Kp), jnp.float32),       # w
        jax.ShapeDtypeStruct((T, Kp), jnp.int32),         # ts
        jax.ShapeDtypeStruct((T, Kp), jnp.int32),         # ln
        jax.ShapeDtypeStruct((8, Kp), jnp.int32),         # n
    ]
    blk = lambda r: pl.BlockSpec((r, B), lambda b: (0, b),
                                 memory_space=pltpu.VMEM)
    v, w, ts, ln, n = pl.pallas_call(
        _oasis_kernel(T, B),
        grid=grid,
        in_specs=[blk(T), blk(8), blk(8)],
        out_specs=[blk(T), blk(T), blk(T), blk(T), blk(8)],
        out_shape=out_shapes,
        interpret=interpret,
    )(vin, g2, s2)
    return v.T, w.T, ts.T, ln.T, n[0]


def _reconstruct(v, w, ts, ln, n, g, T):
    """Pools -> (c, s), batched. All inputs (K, T) / (K,)."""
    K = v.shape[0]
    logg = jnp.log(jnp.maximum(g, 1e-10))[:, None]
    slot = jnp.arange(T)[None, :]
    valid = slot < n[:, None]
    starts = jnp.where(valid, ts, 0)
    is_start = jnp.zeros((K, T), jnp.int32).at[
        jnp.arange(K)[:, None], starts].max(valid.astype(jnp.int32))
    is_start = is_start.at[:, 0].set(1)
    seg = jnp.cumsum(is_start, axis=1) - 1                # (K, T)
    pool_val = jnp.maximum(v / jnp.maximum(w, 1e-20), 0.0)
    tgrid = jnp.arange(T)[None, :]
    t0 = jnp.take_along_axis(ts, seg, axis=1)
    val = jnp.take_along_axis(pool_val, seg, axis=1)
    c = val * jnp.exp(logg * (tgrid - t0).astype(jnp.float32))
    c_prev = jnp.concatenate([jnp.zeros((K, 1), c.dtype), c[:, :-1]], axis=1)
    s = jnp.where((is_start == 1) & (tgrid > 0),
                  c - g[:, None] * c_prev, 0.0)
    return c, s


def oasis_ar1_pallas(y: jnp.ndarray, g: jnp.ndarray, lam: jnp.ndarray,
                     smin: jnp.ndarray, interpret: bool = False):
    """Batched OASIS AR(1) via the Pallas event-loop kernel.

    y: (K, T); g, lam, smin: (K,). Returns (c, s) like
    :func:`cnmf_e_tpu.ops.oasis.oasis_ar1` (exact same pool algorithm).
    """
    K, T = y.shape
    dt = jnp.float32
    y = y.astype(dt)
    g = jnp.broadcast_to(jnp.asarray(g, dt), (K,))
    lam = jnp.broadcast_to(jnp.asarray(lam, dt), (K,))
    smin = jnp.broadcast_to(jnp.asarray(smin, dt), (K,))

    vinit = y - lam[:, None] * (1.0 - g[:, None])
    vinit = vinit.at[:, T - 1].set(y[:, T - 1] - lam)

    Tp = -(-T // 8) * 8
    Kp = -(-K // 128) * 128
    if Tp != T:
        # pad with strongly increasing samples: never merge, stay isolated
        big = jnp.max(jnp.abs(vinit)) * 2.0 + 1e6
        padv = big * (1.0 + jnp.arange(Tp - T, dtype=dt))[None, :] * \
            jnp.ones((K, 1), dt)
        vinit = jnp.concatenate([vinit, padv], axis=1)
    if Kp != K:
        vinit = jnp.concatenate(
            [vinit, jnp.zeros((Kp - K, Tp), dt)], axis=0)
        g = jnp.concatenate([g, jnp.full((Kp - K,), 0.5, dt)])
        smin = jnp.concatenate([smin, jnp.zeros((Kp - K,), dt)])

    v, w, ts, ln, n = _oasis_pools_pallas(vinit, g, smin,
                                          interpret=interpret)
    c, s = _reconstruct(v, w, ts, ln, n, g, Tp)
    return c[:K, :T], s[:K, :T]


def oasis_pallas_supported(T: int) -> bool:
    """VMEM budget check: 6 x (T, 128) f32/i32 arrays must fit comfortably."""
    return T <= 4096
