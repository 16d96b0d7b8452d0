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


def _pass1_lane_width(T: int, lanes: int) -> int:
    """Lane-block width for the sample-level kernel.

    Grid blocks run SEQUENTIALLY on the one TensorCore, so the total
    sequential push count is (lanes / B) * T — the kernel is control-flow
    bound (per-iteration while/fori overhead dwarfs the vector work on a
    (T, B) tile), so B should be as wide as the VMEM budget allows:
    5 resident (T, B) f32/i32 arrays + in-loop temporaries, budgeted at
    ~32 bytes/lane/sample against an 8 MB scoped-VMEM target."""
    budget = 8 * 2 ** 20
    b = budget // (32 * T) // 128 * 128
    b = max(128, min(4096, b))
    lanes_r = -(-lanes // 128) * 128
    return min(b, lanes_r)


@functools.partial(jax.jit, static_argnames=("interpret", "B"))
def _oasis_pools_pallas(vinit: jnp.ndarray, g: jnp.ndarray,
                        smin: jnp.ndarray, interpret: bool = False,
                        B: int = 128):
    """Run the pool-merge kernel. vinit: (Kp, T) lambda-adjusted traces with
    Kp a multiple of 128 and T a multiple of 8. Returns per-trace pool
    arrays (v, w, ts, ln) each (Kp, T) and counts n (Kp,).

    ``B`` = lanes per grid block (multiple of 128; see
    :func:`_pass1_lane_width`). Lane count is padded up to a multiple of B
    with inert traces."""
    K0, T = vinit.shape
    Kp = -(-K0 // B) * B
    if Kp != K0:
        # pad lanes with constant negative traces: collapse to one pool,
        # never bound the merge trip count
        vinit = jnp.concatenate(
            [vinit, jnp.full((Kp - K0, T), -1e6, vinit.dtype)], axis=0)
        g = jnp.concatenate([g, jnp.full((Kp - K0,), 0.5, g.dtype)])
        smin = jnp.concatenate([smin, jnp.zeros((Kp - K0,), smin.dtype)])
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
    return (v.T[:K0], w.T[:K0], ts.T[:K0], ln.T[:K0], n[0, :K0])


def _pool_event_kernel(P_out, B, nc, PL=128):
    """Pool-granularity event loop: push ordered PRE-MERGED pools per lane
    (instead of raw samples) and resolve violations. This is the
    cross-chunk pass of the divide-and-conquer path: its trip count is
    sum-over-chunks of the max-over-lanes per-chunk pool count — typically
    a small fraction of T — and pool merging is confluent (PAVA), so the
    result matches the sample-level loop exactly (same property the XLA DC
    path relies on, reference ``oasisAR1.m:59-109``).

    Pools arrive UNPACKED, chunk-major: panel c holds chunk c's pools at
    rows 0..n1[lane, c)-1 (exactly how the pass-1 kernel wrote them) — a
    host-side stream compaction across chunks would need a (K, T) argsort,
    which costs far more than the kernels themselves on TPU."""

    def kernel(nmax_ref, g_ref, smin_ref, nin_ref, v0_hbm, w0_hbm, ts0_hbm,
               l0_hbm, v_ref, w_ref, ts_ref, ln_ref, n_ref,
               pv, pw, pts, pln, sv, sw, st, sl):
        # Input pools stream from HBM through small (PL, B) VMEM panels —
        # NO buffer aliasing (in-place read-modify-write of a pallas
        # output miscompiles on the axon platform, same pathology as
        # donate_argnums) and no (nc*PL)-sized VMEM input block.
        blk = pl.program_id(0)
        g = g_ref[0, :]                      # (B,)
        smin = smin_ref[0, :]
        logg = jnp.log(jnp.maximum(g, 1e-10))
        rowid = jax.lax.broadcasted_iota(jnp.int32, (P_out, B), 0)

        zf = jnp.zeros((B,), jnp.float32)
        zi = jnp.zeros((B,), jnp.int32)

        v_ref[:, :] = jnp.zeros((P_out, B), jnp.float32)
        w_ref[:, :] = jnp.ones((P_out, B), jnp.float32)
        ts_ref[:, :] = jnp.zeros((P_out, B), jnp.int32)
        ln_ref[:, :] = jnp.zeros((P_out, B), jnp.int32)

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
                vm = vs + vt * gl
                wm = ws + wt * gl * gl
                lm = ls + lt
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

        def panel(c, carry):
            # panel c = chunk c's pool list (rows 0..n1[lane, c))
            cps = [pltpu.make_async_copy(h.at[blk, pl.ds(c * PL, PL), :],
                                         buf, sem)
                   for h, buf, sem in ((v0_hbm, pv, sv), (w0_hbm, pw, sw),
                                       (ts0_hbm, pts, st),
                                       (l0_hbm, pln, sl))]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
            n_chunk = nin_ref[c, :]          # (B,) valid pools this chunk

            def push(j, carry):
                vt, wt, tt, lt, vs, ws, tss, ls, n = carry
                live = j < n_chunk           # (B,) lanes still consuming
                vn = pv[j, :]
                wn = pw[j, :]
                tn = pts[j, :]
                ln_new = pln[j, :]
                do = live & (n >= 2)
                d2 = jnp.maximum(n - 2, 0)
                spill(v_ref, vs, d2, do)
                spill(w_ref, ws, d2, do)
                spill(ts_ref, tss, d2, do)
                spill(ln_ref, ls, d2, do)
                carry = (jnp.where(live, vn, vt),
                         jnp.where(live, wn, wt),
                         jnp.where(live, tn, tt),
                         jnp.where(live, ln_new, lt),
                         jnp.where(live, vt, vs),
                         jnp.where(live, wt, ws),
                         jnp.where(live, tt, tss),
                         jnp.where(live, lt, ls),
                         n + live.astype(jnp.int32))
                return merge_all(carry)

            # per-(block, chunk) event bound from SMEM (a cross-lane max
            # inside the kernel is the kind of reduction Mosaic handles
            # unreliably)
            return jax.lax.fori_loop(0, nmax_ref[blk, c], push, carry)

        carry0 = (zf, jnp.ones((B,), jnp.float32), zi, zi,
                  zf, jnp.ones((B,), jnp.float32), zi, zi, zi)
        vt, wt, tt, lt, vs, ws, tss, ls, n = jax.lax.fori_loop(
            0, nc, panel, carry0)

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
def _pool_merge_pallas(v0, w0, ts0, l0, n_in, g, smin, interpret=False):
    """Resolve violations across per-chunk ordered pool lists.

    v0/w0/ts0/l0: (Kp, nc, L) chunk-local pools exactly as pass 1 wrote
    them (chunk c's valid pools at slots 0..n_in[lane, c)); n_in: (Kp, nc)
    per-chunk counts. Kp a multiple of 128, L a multiple of 8 (the (PL, B)
    panel's sublane dim — L=64 is fine and used by the DC path). Returns
    merged pool arrays (Kp, nc*L) + total counts — consuming the chunk
    lists in place avoids the (K, T) argsort a host-side stream compaction
    would need."""
    Kp, nc, L = v0.shape
    B = 128
    PL = L
    nb = Kp // B
    grid = (nb,)
    Pp = nc * L

    def preb(x, dt):
        # (Kp, nc, L) -> HBM-friendly pre-blocked (nb, nc*L, B): one
        # dynamic slice dim per panel DMA (two dynamic dims materialize a
        # giant intermediate — CLAUDE.md / pallas_ring.py notes)
        return jnp.moveaxis(x.reshape(Kp, Pp).T.reshape(Pp, nb, B),
                            1, 0).astype(dt)

    row8 = lambda x, dt: jnp.broadcast_to(
        x[None, :], (8, Kp)).astype(dt)
    ncp = -(-nc // 8) * 8
    nin_v = jnp.pad(n_in.T, ((0, ncp - nc), (0, 0))).astype(jnp.int32)
    out_shapes = [
        jax.ShapeDtypeStruct((Pp, Kp), jnp.float32),
        jax.ShapeDtypeStruct((Pp, Kp), jnp.float32),
        jax.ShapeDtypeStruct((Pp, Kp), jnp.int32),
        jax.ShapeDtypeStruct((Pp, Kp), jnp.int32),
        jax.ShapeDtypeStruct((8, Kp), jnp.int32),
    ]
    blk = lambda r: pl.BlockSpec((r, B), lambda b: (0, b),
                                 memory_space=pltpu.VMEM)
    # (nb, nc) per-(block, chunk) event bounds for the kernel's SMEM
    n_max_bc = jnp.max(n_in.reshape(nb, B, nc), axis=1).astype(jnp.int32)
    v, w, ts, ln, n = pl.pallas_call(
        _pool_event_kernel(Pp, B, nc, PL=PL),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [blk(8), blk(8), blk(ncp)]
        + [pl.BlockSpec(memory_space=pltpu.HBM)] * 4,
        out_specs=[blk(Pp), blk(Pp), blk(Pp), blk(Pp), blk(8)],
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((PL, B), jnp.float32),
            pltpu.VMEM((PL, B), jnp.float32),
            pltpu.VMEM((PL, B), jnp.int32),
            pltpu.VMEM((PL, B), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(n_max_bc, row8(g, jnp.float32), row8(smin, jnp.float32),
      nin_v, preb(v0, jnp.float32), preb(w0, jnp.float32),
      preb(ts0, jnp.int32), preb(l0, jnp.int32))
    return v.T, w.T, ts.T, ln.T, n[0]


def _reconstruct_kernel(P, B):
    """Pools -> (c, s) inside one Pallas program. The XLA formulation
    (:func:`_reconstruct`) needs a (K, T) scatter + cumsum + two
    take_along_axis gathers — on TPU those lower far slower than this
    simple loop over the ~n_max surviving pools (masked row-range writes
    at VMEM speed)."""

    def kernel(nmax_ref, g_ref, n_ref, v_ref, w_ref, ts_ref, ln_ref,
               c_ref, s_ref):
        blk = pl.program_id(0)
        g = g_ref[0, :]                      # (B,)
        n = n_ref[0, :]                      # (B,)
        logg = jnp.log(jnp.maximum(g, 1e-10))
        rowid = jax.lax.broadcasted_iota(jnp.int32, (P, B), 0)
        c_ref[:, :] = jnp.zeros((P, B), jnp.float32)
        s_ref[:, :] = jnp.zeros((P, B), jnp.float32)

        def pool(j, prev_end):
            live = j < n
            val = jnp.maximum(v_ref[j, :] / jnp.maximum(w_ref[j, :], 1e-20),
                              0.0)
            t0 = ts_ref[j, :]
            ln = ln_ref[j, :]
            # decay curve on the pool's row range [t0, t0+ln)
            dt = jnp.clip(rowid - t0[None, :], 0, P).astype(jnp.float32)
            m = ((rowid >= t0[None, :]) & (rowid < (t0 + ln)[None, :])
                 & live[None, :])
            c_ref[:, :] = jnp.where(
                m, val[None, :] * jnp.exp(logg[None, :] * dt), c_ref[:, :])
            # spike at the pool start: c[t0] - g * c[t0-1]
            sval = val - g * prev_end
            sm = (rowid == t0[None, :]) & (t0 > 0)[None, :] & live[None, :]
            s_ref[:, :] = jnp.where(sm, sval[None, :], s_ref[:, :])
            end = val * jnp.exp(logg * jnp.maximum(ln - 1, 0)
                                .astype(jnp.float32))
            return jnp.where(live, end, prev_end)

        jax.lax.fori_loop(0, nmax_ref[blk], pool, jnp.zeros((B,),
                                                            jnp.float32))

    return kernel


@functools.partial(jax.jit, static_argnames=("T", "interpret"))
def _reconstruct_pallas(v, w, ts, ln, n, g, T, interpret=False):
    """Pools -> (c, s) via the Pallas kernel. v/w/ts/ln: (Kp, P) packed
    pools (valid up to n per trace); returns (Kp, T) traces/spikes."""
    Kp, P = v.shape
    B = 128
    nb = Kp // B
    grid = (nb,)

    row8 = lambda x, dt: jnp.broadcast_to(x[None, :], (8, Kp)).astype(dt)
    blk = lambda r: pl.BlockSpec((r, B), lambda b: (0, b),
                                 memory_space=pltpu.VMEM)
    n_max_blocks = jnp.max(n.reshape(nb, B), axis=1).astype(jnp.int32)
    c, s = pl.pallas_call(
        _reconstruct_kernel(P, B),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk(8), blk(8),
                  blk(P), blk(P), blk(P), blk(P)],
        out_specs=[blk(P), blk(P)],
        out_shape=[jax.ShapeDtypeStruct((P, Kp), jnp.float32),
                   jax.ShapeDtypeStruct((P, Kp), jnp.float32)],
        interpret=interpret,
    )(n_max_blocks, row8(g, jnp.float32), row8(n, jnp.int32),
      v.T.astype(jnp.float32), w.T.astype(jnp.float32),
      ts.T.astype(jnp.int32), ln.T.astype(jnp.int32))
    return c.T[:, :T], s.T[:, :T]


def oasis_ar1_pallas_dc(y: jnp.ndarray, g: jnp.ndarray, lam: jnp.ndarray,
                        smin: jnp.ndarray, L: int = 128,
                        interpret: bool = False):
    """Divide-and-conquer batched OASIS AR(1), both passes on-device.

    Pass 1 runs the sample-level event kernel on length-L chunks (spill
    masks span L rows instead of T — ~T/L x less VMEM traffic); pass 2
    pushes the surviving pools through the pool-granularity kernel (trip
    count = pool count << T). Exact same pool algorithm as
    :func:`oasis_ar1_pallas` (confluent merging).

    y: (K, T); g, lam, smin: (K,). Returns (c, s).
    """
    K, T = y.shape
    dt = jnp.float32
    y = y.astype(dt)
    g = jnp.broadcast_to(jnp.asarray(g, dt), (K,))
    lam = jnp.broadcast_to(jnp.asarray(lam, dt), (K,))
    smin = jnp.broadcast_to(jnp.asarray(smin, dt), (K,))

    vinit = y - lam[:, None] * (1.0 - g[:, None])
    vinit = vinit.at[:, T - 1].set(y[:, T - 1] - lam)

    Tp = -(-T // L) * L
    Kp = -(-K // 128) * 128
    if Tp != T:
        # pad with strongly increasing samples: never merge, stay isolated
        big = jnp.max(jnp.abs(vinit)) * 2.0 + 1e6
        padv = big * (1.0 + jnp.arange(Tp - T, dtype=dt))[None, :] * \
            jnp.ones((K, 1), dt)
        vinit = jnp.concatenate([vinit, padv], axis=1)
    if Kp != K:
        # pad traces collapse to ONE pool per chunk (constant negative
        # value always merges), so they never bound the pass-2 trip count
        vinit = jnp.concatenate(
            [vinit, jnp.full((Kp - K, Tp), -1e6, dt)], axis=0)
        g = jnp.concatenate([g, jnp.full((Kp - K,), 0.5, dt)])
        smin = jnp.concatenate([smin, jnp.zeros((Kp - K,), dt)])

    nc = Tp // L
    # pass 1: chunk-local sample-level solves ((Kp*nc) lanes x L samples)
    vc = vinit.reshape(Kp * nc, L)
    gc = jnp.repeat(g, nc)
    sc = jnp.repeat(smin, nc)
    v1, w1, ts1, l1, n1 = _oasis_pools_pallas(
        vc, gc, sc, interpret=interpret,
        B=_pass1_lane_width(L, Kp * nc))
    # chunk-local times -> global
    offs = (jnp.arange(Kp * nc, dtype=jnp.int32) % nc) * L
    ts1 = ts1 + offs[:, None]

    # pass 2 consumes the chunk-local pool lists in place (no host-side
    # stream compaction — a (K, T) argsort costs more than both kernels)
    v, w, ts, ln, n = _pool_merge_pallas(
        v1.reshape(Kp, nc, L), w1.reshape(Kp, nc, L),
        ts1.reshape(Kp, nc, L), l1.reshape(Kp, nc, L),
        n1.reshape(Kp, nc), g, smin, interpret=interpret)
    if Tp <= 3072:
        c, s = _reconstruct_pallas(v, w, ts, ln, n, g, Tp,
                                   interpret=interpret)
    else:
        # same guard as the single-pass path: the reconstruction kernel's
        # 6 (Tp, 128) VMEM blocks overflow the ~16 MB scoped budget past
        # Tp = 3072 — fall back to the XLA reconstruction
        c, s = _reconstruct(v, w, ts, ln, n, g, Tp)
    return c[:K, :T], s[:K, :T]


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

    v, w, ts, ln, n = _oasis_pools_pallas(
        vinit, g, smin, interpret=interpret,
        B=_pass1_lane_width(Tp, Kp))
    if Tp <= 3072:
        c, s = _reconstruct_pallas(v, w, ts, ln, n, g, Tp,
                                   interpret=interpret)
    else:
        # (T, B) VMEM blocks of the reconstruction kernel would overflow
        # scoped VMEM at the longest single-pass lengths
        c, s = _reconstruct(v, w, ts, ln, n, g, Tp)
    return c[:K, :T], s[:K, :T]


def oasis_pallas_supported(T: int) -> bool:
    """VMEM budget check: the kernels keep ~7 (T, 128) f32/i32 panels in
    scoped VMEM; the 16 MB limit is exceeded from T ~2,500 (measured:
    17.85 MB at T = 3072; 16.26 MB at T = 2560 in the reconstruction
    kernel). Longer traces go through the
    overlap-windowed driver (ops/oasis.py::_oasis_ar1_windowed)."""
    return T <= 2304
