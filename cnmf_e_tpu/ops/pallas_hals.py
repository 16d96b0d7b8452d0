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
with the same blocked update order as the XLA path (fixed point AND
iterate-for-iterate identical — bitwise 0 diff measured on-chip with the
shipped HIGHEST-precision dots; pinned against the float64 oracle in
tests/test_pallas_hals.py).

Layout/performance notes (extending the ops/pallas_ring.py rule list):
  * factors run ROW-major (K sublanes, row-axis lanes) — the native
    ``A.reshape(K, d)`` layout. Neuron indexing = dynamic SUBLANE
    offsets (unrestricted for f32); lanes are touched only by full-width
    ops or TD-aligned DMA slices.
  * V is a symmetric Gram, so the block residual needs only sublane
    slices ``V[k0:k0+B, :]``; the in-block correction needs single
    COLUMNS of the diagonal block, which would be dynamic lane slices —
    those rows are precomputed outside as a (nb*B, B) stack indexed by
    sublane instead.
  * the cost is LATENCY (tiles x sweeps x K sequential row updates), so
    tile size directly divides wall time. The auto-blocked grid pipeline
    DOUBLE-BUFFERS every operand (halving the feasible tile); inputs
    therefore stay in HBM (explicit ``pltpu.HBM`` — ANY may spill them
    into VMEM) and the kernel DMAs single-buffered tiles itself: 2-3
    VMEM-resident buffers instead of 6-8 -> ~2x the tile width. The
    ~25 us/tile serialized DMA is noise against the ~0.6 ms/tile solve.
  * MXU dots inside kernels default to single-pass bf16; the sweeps
    amplify that rounding (measured 0.14 abs drift on temporal Grams
    with O(100) entries). ``Precision.HIGHEST`` (f32 emulation) is
    bitwise-identical to the XLA path; Mosaic does NOT lower
    ``Precision.HIGH``, so the only cheaper option is an explicit
    bf16 hi/lo split (not worth it: a DEFAULT-dot diagnostic measured
    the dots at a minority of kernel time).
  * one kernel serves both factors: spatial = relu + optional support
    mask, temporal = no relu; per-row gating (cc > 0, `active`) arrives
    as a float vector.
  * FREE-BLOCK fast path (``flags``): a block whose rows are pairwise
    non-interacting — zero Gram coupling for the temporal factor,
    disjoint support masks for the spatial one — updates all B rows in
    ONE vectorized step instead of B sequential rank-1 updates, bitwise
    identically (the sequential correction dot sums exact zeros). This
    is the reference's own independent-set trick
    (``utilities/update_order.m:1-21``, used by
    ``update_temporal_components.m`` to batch non-overlapping neurons)
    recast for the TPU: the caller orders neurons by a greedy coloring
    of the overlap graph so blocks are single-color, and passes a
    per-block flag; the sequential-update latency (the round-3/4
    bottleneck) collapses from K to ~n_blocks steps.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hals_rows_kernel(n_iter: int, B: int, Kp: int, TD: int, relu: bool,
                      has_mask: bool, has_flags: bool,
                      fast_dots: bool = False):
    """Kernel body. VMEM refs: V (Kp, Kp) symmetric Gram; Vbb (nb*B, B)
    stacked diagonal-block rows (Vbb[j*B+i, :] = V[k0+i, k0:k0+B]);
    cc (Kp, 1) update denominators; gate (Kp, 1) 1.0 where the row
    updates. SMEM (when ``has_flags``): flags (nb,) int32, 1 = the block's
    rows are pairwise independent (free-block vectorized update). HBM
    refs: U, [mask], X inputs and the out buffer, all (Kp, dp); the
    kernel DMAs one (Kp, TD) tile of each in, solves every sweep in
    place, and DMAs the tile back."""
    nb = Kp // B

    def kernel(*refs):
        flags_ref = None
        if has_flags:
            flags_ref, refs = refs[0], refs[1:]
        if has_mask:
            (V_ref, Vbb_ref, cc_ref, gate_ref, U_hbm, mask_hbm, X_hbm,
             out_hbm, Xs, Us, Ms, R_ref, sems) = refs
        else:
            (V_ref, Vbb_ref, cc_ref, gate_ref, U_hbm, X_hbm,
             out_hbm, Xs, Us, R_ref, sems) = refs
            mask_hbm = Ms = None

        prec = (jax.lax.Precision.DEFAULT if fast_dots
                else jax.lax.Precision.HIGHEST)
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

        def block_update(j, _):
            k0 = j * B
            Vb = V_ref[pl.ds(k0, B), :]                     # (B, Kp)
            Ub = Us[pl.ds(k0, B), :]                        # (B, TD)
            X0 = Xs[pl.ds(k0, B), :]                        # snapshot
            # block residual: one (B, Kp) x (Kp, TD) MXU matmul reads the
            # whole resident factor once per block; staged through VMEM
            # scratch so the inner loop's row access is a ref dynamic
            # slice (value dynamic_slice has no Mosaic lowering)
            R_ref[:, :] = Ub - jnp.dot(Vb, Xs[:, :],
                                       preferred_element_type=jnp.float32,
                                       precision=prec)

            def inner(i, _):
                k = k0 + i
                delta = Xs[pl.ds(k0, B), :] - X0            # (B, TD)
                w = Vbb_ref[pl.ds(j * B + i, 1), :]         # (1, B)
                r = R_ref[pl.ds(i, 1), :] - jnp.dot(
                    w, delta, preferred_element_type=jnp.float32,
                    precision=prec)
                x_cur = Xs[pl.ds(k, 1), :]                  # (1, TD)
                cc_k = cc_ref[pl.ds(k, 1), :]               # (1, 1)
                xk = x_cur + r / jnp.maximum(cc_k, 1e-12)
                if relu:
                    xk = jnp.maximum(xk, 0.0)
                if Ms is not None:
                    xk = jnp.where(Ms[pl.ds(k, 1), :] > 0, xk, 0.0)
                g = gate_ref[pl.ds(k, 1), :]                # (1, 1)
                Xs[pl.ds(k, 1), :] = g * xk + (1.0 - g) * x_cur
                return 0

            if flags_ref is None:
                jax.lax.fori_loop(0, B, inner, 0)
                return 0

            # free-block fast path: all B rows update in one vectorized
            # step when the caller certifies pairwise independence —
            # bitwise identical to the sequential loop (its correction
            # dot would sum exact zeros). Mixed blocks take the
            # sequential loop via a traced trip count (no lax.cond).
            free = (flags_ref[j] > 0).astype(jnp.float32)
            ccb = cc_ref[pl.ds(k0, B), :]                   # (B, 1)
            gb = gate_ref[pl.ds(k0, B), :]                  # (B, 1)
            xv = X0 + R_ref[:, :] / jnp.maximum(ccb, 1e-12)
            if relu:
                xv = jnp.maximum(xv, 0.0)
            if Ms is not None:
                xv = jnp.where(Ms[pl.ds(k0, B), :] > 0, xv, 0.0)
            xv = gb * xv + (1.0 - gb) * X0
            Xs[pl.ds(k0, B), :] = free * xv + (1.0 - free) * X0
            n_inner = jnp.where(free > 0, 0, B)
            jax.lax.fori_loop(0, n_inner, inner, 0)
            return 0

        def sweep(_, carry):
            jax.lax.fori_loop(0, nb, block_update, 0)
            return carry

        jax.lax.fori_loop(0, n_iter, sweep, 0)

        cp_out = pltpu.make_async_copy(Xs, out_hbm.at[:, pl.ds(off, TD)],
                                       sems.at[0])
        cp_out.start()
        # single-buffered scratch: the next grid step's input DMA reuses
        # Xs, so the write-back must complete before this step ends
        cp_out.wait()

    return kernel


def _pick_tile(Kp: int, dp: int, B: int, has_mask: bool,
               has_flags: bool = False,
               budget_bytes: int = 14 * 2**20) -> int:
    """Largest 128-multiple row-tile fitting the 16 MB scoped-VMEM limit.

    Single-buffered manual-DMA layout: the (Kp, TD) X and U tiles (plus
    the optional mask tile) live once each, plus the (B, TD) residual
    scratch and the unblocked V/Vbb/cc/gate. The free-block path keeps
    extra (B, TD) temporaries live (the vectorized candidate and its
    select chain); the compiler's stack accounting measured ~530 B/lane
    beyond the plain layout at bench shapes — budgeted as 12 B-rows per
    lane (2 compile-measured calibrations: 17.19M at TD 6016 masked,
    16.05M at TD 7424 maskless)."""
    n_bufs = 2 + int(has_mask)
    fixed = Kp * Kp * 4 + 2 * Kp * B * 4 + 4 * Kp * 4 + 64 * 2**10
    per_lane = (n_bufs * Kp + B) * 4
    if has_flags:
        per_lane += 12 * B * 4
    td = (budget_bytes - fixed) // per_lane
    td = max(128, min(int(td) // 128 * 128, dp))
    return td


@functools.partial(jax.jit, static_argnames=("n_iter", "block", "relu",
                                             "fast_dots", "interpret"))
def hals_sweeps_rows_pallas(U: jnp.ndarray, V: jnp.ndarray, X: jnp.ndarray,
                            gate: jnp.ndarray,
                            mask: Optional[jnp.ndarray] = None,
                            n_iter: int = 5, block: int = 16,
                            relu: bool = True,
                            flags: Optional[jnp.ndarray] = None,
                            fast_dots: bool = False,
                            interpret: bool = False) -> jnp.ndarray:
    """Run ``n_iter`` blocked Gauss-Seidel sweeps on row-major factors.

    X, U: (K, d) — rows are neurons; V: (K, K) symmetric Gram;
    gate: (K,) bool/float — rows with gate == 0 keep their input value
    (covers the XLA path's ``cc > 0`` and ``active`` guards);
    mask: optional (K, d) support mask (spatial search locations);
    flags: optional (ceil(K/block),) int — 1 marks a block whose ACTIVE
    rows are pairwise independent (zero Gram coupling, or disjoint masks
    for the masked spatial factor): it updates vectorized instead of
    sequentially, bitwise identically. Produce flags + a color ordering
    with :mod:`cnmf_e_tpu.ops.coloring` (reference:
    ``utilities/update_order.m:1-21``).

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
    B = max(1, min(block, K))
    Kp = -(-K // B) * B
    if Kp != K:
        U = jnp.pad(U, ((0, Kp - K), (0, 0)))
        V = jnp.pad(V, ((0, Kp - K), (0, Kp - K)))
        X = jnp.pad(X, ((0, Kp - K), (0, 0)))
        gate = jnp.pad(gate.astype(jnp.float32), (0, Kp - K))
        if mask is not None:
            mask = jnp.pad(mask, ((0, Kp - K), (0, 0)))

    TD = _pick_tile(Kp, -(-d // 128) * 128, B, mask is not None,
                    flags is not None)
    dp = -(-d // TD) * TD
    if dp != d:
        U = jnp.pad(U, ((0, 0), (0, dp - d)))
        X = jnp.pad(X, ((0, 0), (0, dp - d)))
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (0, dp - d)))

    cc = jnp.diag(V).astype(jnp.float32)
    gate = (gate.astype(jnp.float32) * (cc > 0))[:, None]   # (Kp, 1)
    cc = cc[:, None]

    # stacked diagonal-block rows: Vbb[j*B+i, :] = V[k0+i, k0:k0+B]
    nb = Kp // B
    jj = jnp.arange(nb)
    Vbb = jax.vmap(
        lambda j: jax.lax.dynamic_slice(V, (j * B, j * B), (B, B)))(jj)
    Vbb = Vbb.reshape(nb * B, B)

    n_tiles = dp // TD
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = lambda: pl.BlockSpec(memory_space=pltpu.HBM)
    in_specs, args = [], []
    if flags is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(flags.astype(jnp.int32))
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
                          flags is not None, fast_dots),
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
