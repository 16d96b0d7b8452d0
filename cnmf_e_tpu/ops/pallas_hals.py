"""Fused Pallas TPU kernel for multi-sweep HALS Gauss-Seidel updates.

Reference semantics: ``HALS_spatial.m:26-46`` / ``HALS_temporal.m:58-107``
— sequential per-neuron rank-1 updates given precomputed Grams. The XLA
path (:mod:`cnmf_e_tpu.ops.hals`) runs the blocked sweeps as hundreds of
small dependent HLO ops; each re-reads the (d, K) factor from HBM, so at
bench scale the sweeps moved ~3 GB/iteration and ran latency-bound at
~25% of the chip's HBM floor (PERF.md round 3).

The TPU insight: Gauss-Seidel over NEURONS is embarrassingly parallel
over ROWS (pixels for the spatial factor, frames for the temporal one) —
every coupling term goes through the K x K Gram. So this kernel tiles the
row axis into VMEM and runs ALL sweeps on a resident tile: exactly one
HBM read of (A, U) and one write of A for the entire multi-sweep solve,
with the same update order as the XLA path (fixed point AND
iterate-for-iterate identical — bitwise 0 diff measured on-chip with the
shipped HIGHEST-precision dots; pinned against the float64 oracle in
tests/test_pallas_hals.py).

Round-5 structure — the CLASS-SCHEDULED sweep (replaces round 4's fixed
16-row blocks + free flags): the caller orders neurons by a greedy
coloring of the overlap graph (``ops/coloring.py``; the reference's own
independent-set trick, ``utilities/update_order.m:1-21``) and passes a
STEP SCHEDULE (starts/ends/free arrays in SMEM + a traced step count):
each step covers up to ``block`` rows of ONE color class — the block
grid restarts at every class boundary, with the step's update
positionally gated to [start, end). Because all updated rows of a step
are pairwise independent (exact-zero Gram coupling / disjoint masks),
the vectorized step update equals the sequential loop exactly in real
arithmetic; in f32 the class-aligned partition recomputes residuals
where the fixed-block path applies delta corrections, an ulp-level
reassociation difference (pinned vs the float64 oracle in
tests/test_pallas_hals.py). The step's block-residual matmul runs with
M = block (64+) instead of 16 — the round-4 verdict's "color-batched
residual matmuls" lever.
Steps are dynamic SUBLANE offsets (unrestricted for f32), so no
physical padding of the factors or Grams is needed. Non-free steps
(schedule overflow fallback) take the sequential inner loop with a
traced trip count.

Layout/performance notes (extending the ops/pallas_ring.py rule list):
  * factors run ROW-major (K sublanes, row-axis lanes) — the native
    ``A.reshape(K, d)`` layout. Step starts are dynamic SUBLANE
    offsets; lanes are touched only by full-width ops or TD-aligned DMA
    slices.
  * V is a symmetric Gram, so the step residual needs only sublane
    slices ``V[sc:sc+B, :]``; the sequential fallback's correction
    needs single COLUMNS of the diagonal block, precomputed outside as
    a (n_cap*B, B) row stack indexed by sublane.
  * the cost is LATENCY (tiles x sweeps x sequential steps), so tile
    size and step count directly divide wall time. The auto-blocked
    grid pipeline DOUBLE-BUFFERS every operand; inputs therefore stay
    in HBM (explicit ``pltpu.HBM``) and the kernel DMAs single-buffered
    tiles itself.
  * in-kernel dot precision (``dots``): "highest" (f32 emulation,
    bitwise-identical to the XLA path; ~6 bf16 passes), "hi_lo" (an
    explicit 2-way bf16 split, 3 passes: hi*hi + hi*lo + lo*hi — ~2x
    cheaper dots at ~2^-16 relative error; validate chained drift
    before promoting), "fast" (single-pass bf16 — measured 33% max-rel
    C drift over a 10-iteration chain, diagnostics only). Mosaic does
    not lower ``Precision.HIGH``, hence the explicit split.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_dot(dots: str):
    f32 = jnp.float32

    def dot(a, b):
        if dots == "highest":
            return jnp.dot(a, b, preferred_element_type=f32,
                           precision=jax.lax.Precision.HIGHEST)
        if dots == "fast":
            return jnp.dot(a, b, preferred_element_type=f32,
                           precision=jax.lax.Precision.DEFAULT)
        # hi_lo: 2-way bf16 split, drop the lo*lo term (3 MXU passes)
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(f32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(f32)).astype(jnp.bfloat16)
        d = jax.lax.Precision.DEFAULT
        return (jnp.dot(ah, bh, preferred_element_type=f32, precision=d)
                + jnp.dot(ah, bl, preferred_element_type=f32, precision=d)
                + jnp.dot(al, bh, preferred_element_type=f32, precision=d))

    return dot


def _hals_rows_kernel(n_iter: int, B: int, Kp: int, TD: int, relu: bool,
                      has_mask: bool, dots: str):
    """Kernel body. SMEM refs: starts/ends/free (n_cap,) int32 step
    schedule + n_steps (1,) int32 traced trip count. VMEM refs:
    V (Kp, Kp) symmetric Gram; Vbb (n_cap*B, B) stacked diagonal blocks
    (Vbb[j*B+i, :] = V[sc_j+i, sc_j:sc_j+B]); cc (Kp, 1) update
    denominators; gate (Kp, 1) 1.0 where the row updates. HBM refs:
    U, [mask], X inputs and the out buffer, all (Kp, dp); the kernel
    DMAs one (Kp, TD) tile of each in, solves every sweep in place, and
    DMAs the tile back."""
    dot = _make_dot(dots)

    def kernel(*refs):
        (st_ref, en_ref, fr_ref, ns_ref, refs) = (refs[0], refs[1],
                                                  refs[2], refs[3],
                                                  refs[4:])
        if has_mask:
            (V_ref, Vbb_ref, cc_ref, gate_ref, U_hbm, mask_hbm, X_hbm,
             out_hbm, Xs, Us, Ms, R_ref, sems) = refs
        else:
            (V_ref, Vbb_ref, cc_ref, gate_ref, U_hbm, X_hbm,
             out_hbm, Xs, Us, R_ref, sems) = refs
            mask_hbm = Ms = None

        i = pl.program_id(0)
        off = pl.multiple_of(i * TD, 128)
        cp_x = pltpu.make_async_copy(X_hbm.at[:, pl.ds(off, TD)], Xs,
                                     sems.at[0])
        cp_u = pltpu.make_async_copy(U_hbm.at[:, pl.ds(off, TD)], Us,
                                     sems.at[1])
        cp_x.start()
        cp_u.start()
        if mask_hbm is not None:
            cp_m = pltpu.make_async_copy(mask_hbm.at[:, pl.ds(off, TD)],
                                         Ms, sems.at[2])
            cp_m.start()
            cp_m.wait()
        cp_x.wait()
        cp_u.wait()
        if Ms is not None:
            # zero masked-out entries of the initial iterate (the XLA
            # path pre-applies the mask the same way)
            Xs[:, :] = jnp.where(Ms[:, :] > 0, Xs[:, :], 0.0)

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)

        def step_update(j, _):
            s = st_ref[j]
            e = en_ref[j]
            fr = fr_ref[j]
            # slice start: align down to a multiple of 8 (Mosaic demands
            # multi-sublane slice starts provably 0 mod 8 — the schedule
            # anchors step grids accordingly) and clamp so sc + B <= Kp;
            # rows below `s` (previous classes, already at their fixed
            # point) are excluded by the positional gate, never
            # re-updated
            sc = pl.multiple_of(
                jnp.minimum((s // 8) * 8, Kp - B), 8)
            Vb = V_ref[pl.ds(sc, B), :]                     # (B, Kp)
            Ub = Us[pl.ds(sc, B), :]                        # (B, TD)
            X0 = Xs[pl.ds(sc, B), :]                        # snapshot
            # step residual: one (B, Kp) x (Kp, TD) MXU matmul reads the
            # whole resident factor; staged through VMEM scratch so the
            # fallback's row access is a ref dynamic slice (value
            # dynamic_slice has no Mosaic lowering)
            R_ref[:, :] = Ub - dot(Vb, Xs[:, :])

            rows = sc + rows_i                              # (B, 1)
            pos = ((rows >= s) & (rows < e)).astype(jnp.float32)

            # free step: all gated rows update in one vectorized step —
            # bitwise identical to the sequential loop (same-class rows
            # have exact-zero coupling, so its correction dot sums zeros)
            ccb = cc_ref[pl.ds(sc, B), :]                   # (B, 1)
            gb = gate_ref[pl.ds(sc, B), :] * pos            # (B, 1)
            xv = X0 + R_ref[:, :] / jnp.maximum(ccb, 1e-12)
            if relu:
                xv = jnp.maximum(xv, 0.0)
            if Ms is not None:
                xv = jnp.where(Ms[pl.ds(sc, B), :] > 0, xv, 0.0)
            xv = gb * xv + (1.0 - gb) * X0
            free = (fr > 0).astype(jnp.float32)
            Xs[pl.ds(sc, B), :] = free * xv + (1.0 - free) * X0

            def inner(i2, _):
                k = sc + i2
                delta = Xs[pl.ds(sc, B), :] - X0            # (B, TD)
                w = Vbb_ref[pl.ds(j * B + i2, 1), :]        # (1, B)
                r = R_ref[pl.ds(i2, 1), :] - dot(w, delta)
                x_cur = Xs[pl.ds(k, 1), :]                  # (1, TD)
                cc_k = cc_ref[pl.ds(k, 1), :]               # (1, 1)
                xk = x_cur + r / jnp.maximum(cc_k, 1e-12)
                if relu:
                    xk = jnp.maximum(xk, 0.0)
                if Ms is not None:
                    xk = jnp.where(Ms[pl.ds(k, 1), :] > 0, xk, 0.0)
                g = gate_ref[pl.ds(k, 1), :] \
                    * ((k >= s) & (k < e)).astype(jnp.float32)
                Xs[pl.ds(k, 1), :] = g * xk + (1.0 - g) * x_cur
                return 0

            # mixed steps (schedule-overflow fallback) take the
            # sequential loop via a traced trip count (no lax.cond)
            n_inner = jnp.where(fr > 0, 0, B)
            jax.lax.fori_loop(0, n_inner, inner, 0)
            return 0

        def sweep(_, carry):
            jax.lax.fori_loop(0, ns_ref[0], step_update, 0)
            return carry

        jax.lax.fori_loop(0, n_iter, sweep, 0)

        cp_out = pltpu.make_async_copy(Xs, out_hbm.at[:, pl.ds(off, TD)],
                                       sems.at[0])
        cp_out.start()
        # single-buffered scratch: the next grid step's input DMA reuses
        # Xs, so the write-back must complete before this step ends
        cp_out.wait()

    return kernel


def _pick_tile(Kp: int, dp: int, B: int, n_cap: int, has_mask: bool,
               budget_bytes: int = 14 * 2**20) -> int:
    """Largest 128-multiple row-tile fitting the 16 MB scoped-VMEM limit.

    Single-buffered manual-DMA layout: the (Kp, TD) X and U tiles (plus
    the optional mask tile) live once each, plus the (B, TD) residual
    scratch and the unblocked V/Vbb/cc/gate. The vectorized step keeps
    extra (B, TD) temporaries live (the candidate and its select chain);
    the compiler's stack accounting measured ~530 B/lane beyond the
    plain layout at bench shapes — budgeted as 12 B-rows per lane
    (compile-measured calibrations, round 4)."""
    n_bufs = 2 + int(has_mask)
    fixed = Kp * Kp * 4 + n_cap * B * B * 4 + 4 * Kp * 4 + 64 * 2**10
    per_lane = (n_bufs * Kp + B) * 4 + 12 * B * 4
    td = (budget_bytes - fixed) // per_lane
    td = max(128, min(int(td) // 128 * 128, dp))
    return td


@functools.partial(jax.jit, static_argnames=("n_iter", "block", "relu",
                                             "dots", "interpret"))
def hals_sweeps_rows_pallas(U: jnp.ndarray, V: jnp.ndarray, X: jnp.ndarray,
                            gate: jnp.ndarray,
                            mask: Optional[jnp.ndarray] = None,
                            n_iter: int = 5, block: int = 16,
                            relu: bool = True,
                            schedule: Optional[Tuple] = None,
                            flags: Optional[jnp.ndarray] = None,
                            dots: str = "highest",
                            interpret: bool = False) -> jnp.ndarray:
    """Run ``n_iter`` scheduled Gauss-Seidel sweeps on row-major factors.

    X, U: (K, d) — rows are neurons; V: (K, K) symmetric Gram;
    gate: (K,) bool/float — rows with gate == 0 keep their input value
    (covers the XLA path's ``cc > 0`` and ``active`` guards);
    mask: optional (K, d) support mask (spatial search locations);
    schedule: optional (starts, ends, free, n_steps) from
    ``ops.coloring.class_step_schedule`` — rows must already be in
    colored order; every free step updates its [start, end) rows in one
    vectorized M = block matmul step (update_order.m:1-21 semantics).
    flags: legacy per-16-row-block independence flags — converted to a
    block-grid schedule; ignored when ``schedule`` is given.
    dots: in-kernel MXU dot precision ("highest" | "hi_lo" | "fast");
    see the module docstring.

    Returns the updated (K, d) factor. Update order and arithmetic match
    ``ops.hals.hals_spatial_sweeps`` / ``hals_temporal_sweeps``.

    With ``relu=True`` the mask is folded into U as a -BIG sentinel
    instead of streaming a third (K, d) HBM buffer through the kernel:
    a masked-out pixel's update is relu(x + (-BIG - corr)/cc) = 0
    exactly, and masked rows of X start (and inductively stay) zero, so
    every other row's residual sees the same operands — bitwise
    identical to the explicit mask path with one fewer tile buffer
    (wider tiles, fewer latency-bound tile steps) and no per-row where.
    """
    K, d = X.shape
    if mask is not None and relu:
        mb = mask if mask.dtype == jnp.bool_ else mask > 0
        X = jnp.where(mb, X, 0.0)
        U = jnp.where(mb, U.astype(jnp.float32), -1e30)
        mask = None
    # B must be a multiple of 8: slice starts are proven 0 mod 8 and
    # Kp - B must stay on that grid
    B = max(8, -(-min(block, max(K, 1)) // 8) * 8)
    Kp = -(-K // B) * B
    if Kp != K:
        U = jnp.pad(U, ((0, Kp - K), (0, 0)))
        V = jnp.pad(V, ((0, Kp - K), (0, Kp - K)))
        X = jnp.pad(X, ((0, Kp - K), (0, 0)))
        gate = jnp.pad(gate.astype(jnp.float32), (0, Kp - K))
        if mask is not None:
            mask = jnp.pad(mask, ((0, Kp - K), (0, 0)))

    nb = Kp // B
    if schedule is not None:
        starts, ends, free, n_steps = schedule
        n_cap = starts.shape[0]
        # rows past K (block padding) never update: ends <= K always
        # (class_step_schedule emits ends <= K), and gate pads to 0
    else:
        # block-grid schedule over the padded rows; ends gate at K
        n_cap = nb
        jj = jnp.arange(nb, dtype=jnp.int32)
        starts = jj * B
        ends = jnp.full((nb,), K, jnp.int32)
        free = (flags.astype(jnp.int32) if flags is not None
                else jnp.zeros((nb,), jnp.int32))
        n_steps = jnp.int32(nb)

    TD = _pick_tile(Kp, -(-d // 128) * 128, B, n_cap, mask is not None)
    dp = -(-d // TD) * TD
    if dp != d:
        U = jnp.pad(U, ((0, 0), (0, dp - d)))
        X = jnp.pad(X, ((0, 0), (0, dp - d)))
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (0, dp - d)))

    cc = jnp.diag(V).astype(jnp.float32)
    gate = (gate.astype(jnp.float32) * (cc > 0))[:, None]   # (Kp, 1)
    cc = cc[:, None]

    # stacked diagonal blocks at the CLAMPED step starts:
    # Vbb[j*B+i, :] = V[sc_j+i, sc_j:sc_j+B]
    sc_arr = jnp.clip(jnp.minimum((starts // 8) * 8, Kp - B), 0, Kp - B)
    Vbb = jax.vmap(
        lambda s: jax.lax.dynamic_slice(V, (s, s), (B, B)))(sc_arr)
    Vbb = Vbb.reshape(n_cap * B, B)

    n_tiles = dp // TD
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = lambda: pl.BlockSpec(memory_space=pltpu.HBM)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [smem(), smem(), smem(), smem()]
    args = [starts.astype(jnp.int32), ends.astype(jnp.int32),
            free.astype(jnp.int32),
            jnp.asarray(n_steps, jnp.int32).reshape(1)]
    in_specs += [vmem(), vmem(), vmem(), vmem(), hbm()]     # V Vbb cc gate U
    args += [V, Vbb, cc, gate, U.astype(jnp.float32)]
    if mask is not None:
        in_specs.append(hbm())
        args.append(mask.astype(jnp.float32))
    in_specs.append(hbm())                                  # X
    args.append(X.astype(jnp.float32))

    scratch = [pltpu.VMEM((Kp, TD), jnp.float32),           # Xs
               pltpu.VMEM((Kp, TD), jnp.float32)]           # Us
    if mask is not None:
        scratch.append(pltpu.VMEM((Kp, TD), jnp.float32))   # Ms
    scratch += [pltpu.VMEM((B, TD), jnp.float32),           # R
                pltpu.SemaphoreType.DMA((3,))]

    out = pl.pallas_call(
        _hals_rows_kernel(n_iter, B, Kp, TD, relu, mask is not None,
                          dots),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((Kp, dp), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return out[:K, :d]


def pallas_hals_eligible(K: int, block: int = 16) -> bool:
    """The kernel holds V (and the X/U row tiles) in VMEM: past
    K ~ 1024 the Gram alone crowds out the tiles — fall back to XLA.
    Multi-device processes also fall back: a pallas_call is opaque to the
    SPMD partitioner, so sharded callers must run the XLA path (callers
    under an explicit mesh already pass use_pallas=False)."""
    Kp = -(-K // block) * block
    return (Kp <= 1024
            and jax.default_backend() in ("tpu", "axon")
            and len(jax.devices()) == 1)
