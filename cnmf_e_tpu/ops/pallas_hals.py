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
iterate-for-iterate identical up to f32 rounding; pinned against the
float64 oracle in tests/test_pallas_hals.py).

Layout notes (the rules ops/pallas_ring.py learned the hard way):
  * factors run ROW-major (K sublanes, row-axis lanes) — the native
    ``A.reshape(K, d)`` layout. Neuron indexing = dynamic SUBLANE
    offsets (unrestricted for f32); lanes are touched only by full-width
    ops, so the 128-multiple dynamic-lane rule never triggers.
  * V is a symmetric Gram, so the block residual needs only sublane
    slices ``V[k0:k0+B, :]``; the in-block correction needs single
    COLUMNS of the diagonal block, which would be dynamic lane slices —
    those rows are precomputed outside as a (nb*B, B) stack indexed by
    sublane instead.
  * one kernel serves both factors: spatial = relu + optional support
    mask, temporal = no relu; per-row gating (cc > 0, `active`) arrives
    as a float vector.
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
                      has_mask: bool):
    """Kernel body: X_ref (Kp, TD) updated in place through out_ref.

    Args (refs): V (Kp, Kp) symmetric Gram; Vbb (nb*B, B) stacked
    diagonal-block rows (Vbb[j*B+i, :] = V[k0+i, k0:k0+B]); cc (Kp, 1)
    update denominators; gate (Kp, 1) 1.0 where the row updates;
    U (Kp, TD); [mask (Kp, TD)]; X (Kp, TD); out (Kp, TD).
    """
    nb = Kp // B

    def kernel(*refs):
        if has_mask:
            (V_ref, Vbb_ref, cc_ref, gate_ref, U_ref, mask_ref, X_ref,
             out_ref, R_ref) = refs
        else:
            (V_ref, Vbb_ref, cc_ref, gate_ref, U_ref, X_ref, out_ref,
             R_ref) = refs
            mask_ref = None

        out_ref[:, :] = X_ref[:, :]

        def block_update(j, _):
            k0 = j * B
            Vb = V_ref[pl.ds(k0, B), :]                     # (B, Kp)
            Ub = U_ref[pl.ds(k0, B), :]                     # (B, TD)
            X0 = out_ref[pl.ds(k0, B), :]                   # snapshot
            # block residual: one (B, Kp) x (Kp, TD) MXU matmul reads the
            # whole resident factor once per block; staged through VMEM
            # scratch so the inner loop's row access is a ref dynamic
            # slice (value dynamic_slice has no Mosaic lowering)
            # Precision.HIGHEST: the MXU's default single-pass bf16
            # rounding accumulates through the sequential sweeps (measured
            # 0.14 abs drift vs the f32 oracle on temporal Grams whose
            # entries are O(100)); full f32 emulation costs ~6 MXU passes
            # on a FLOP count that is <1% of the Gram stage's
            R_ref[:, :] = Ub - jnp.dot(Vb, out_ref[:, :],
                                       preferred_element_type=jnp.float32,
                                       precision=jax.lax.Precision.HIGHEST)

            def inner(i, _):
                k = k0 + i
                delta = out_ref[pl.ds(k0, B), :] - X0       # (B, TD)
                w = Vbb_ref[pl.ds(j * B + i, 1), :]         # (1, B)
                r = R_ref[pl.ds(i, 1), :] - jnp.dot(
                    w, delta, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                x_cur = out_ref[pl.ds(k, 1), :]             # (1, TD)
                cc_k = cc_ref[pl.ds(k, 1), :]               # (1, 1)
                xk = x_cur + r / jnp.maximum(cc_k, 1e-12)
                if relu:
                    xk = jnp.maximum(xk, 0.0)
                if mask_ref is not None:
                    xk = jnp.where(mask_ref[pl.ds(k, 1), :] > 0, xk, 0.0)
                g = gate_ref[pl.ds(k, 1), :]                # (1, 1)
                out_ref[pl.ds(k, 1), :] = g * xk + (1.0 - g) * x_cur
                return 0

            jax.lax.fori_loop(0, B, inner, 0)
            return 0

        def sweep(_, carry):
            jax.lax.fori_loop(0, nb, block_update, 0)
            return carry

        jax.lax.fori_loop(0, n_iter, sweep, 0)

    return kernel


def _pick_tile(Kp: int, dp: int, B: int,
               budget_bytes: int = 14 * 2**20) -> int:
    """Largest 128-multiple row-tile fitting the 16 MB scoped-VMEM limit.

    The grid pipeline DOUBLE-BUFFERS every blocked operand (measured:
    a 3-buffer estimate compiled to 2x the expected allocation and OOMed),
    so the three (Kp, TD) buffers (X, U, out) count six times, plus the
    (B, TD) residual scratch, plus the unblocked V/Vbb/cc/gate."""
    fixed = Kp * Kp * 4 + 2 * Kp * B * 4 + 4 * Kp * 4 + 64 * 2**10
    per_lane = (6 * Kp + B) * 4
    td = (budget_bytes - fixed) // per_lane
    td = max(128, min(int(td) // 128 * 128, dp))
    return td


@functools.partial(jax.jit, static_argnames=("n_iter", "block", "relu",
                                             "interpret"))
def hals_sweeps_rows_pallas(U: jnp.ndarray, V: jnp.ndarray, X: jnp.ndarray,
                            gate: jnp.ndarray,
                            mask: Optional[jnp.ndarray] = None,
                            n_iter: int = 5, block: int = 16,
                            relu: bool = True,
                            interpret: bool = False) -> jnp.ndarray:
    """Run ``n_iter`` blocked Gauss-Seidel sweeps on row-major factors.

    X, U: (K, d) — rows are neurons; V: (K, K) symmetric Gram;
    gate: (K,) bool/float — rows with gate == 0 keep their input value
    (covers the XLA path's ``cc > 0`` and ``active`` guards);
    mask: optional (K, d) support mask (spatial search locations).

    Returns the updated (K, d) factor. Update order and arithmetic match
    ``ops.hals.hals_spatial_sweeps`` / ``hals_temporal_sweeps``.
    """
    K, d = X.shape
    B = max(1, min(block, K))
    Kp = -(-K // B) * B
    if Kp != K:
        U = jnp.pad(U, ((0, Kp - K), (0, 0)))
        V = jnp.pad(V, ((0, Kp - K), (0, Kp - K)))
        X = jnp.pad(X, ((0, Kp - K), (0, 0)))
        gate = jnp.pad(gate.astype(jnp.float32), (0, Kp - K))
        if mask is not None:
            mask = jnp.pad(mask, ((0, Kp - K), (0, 0)))

    TD = _pick_tile(Kp, -(-d // 128) * 128, B)
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

    if mask is not None:
        X = jnp.where(mask > 0, X, 0.0)

    n_tiles = dp // TD
    row_specs = [
        pl.BlockSpec((Kp, TD), lambda i: (0, i),
                     memory_space=pltpu.VMEM)]
    fixed_specs = [
        pl.BlockSpec((Kp, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nb * B, B), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Kp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Kp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    in_specs = fixed_specs + row_specs                      # U
    args = [V, Vbb, cc, gate, U.astype(jnp.float32)]
    if mask is not None:
        in_specs = in_specs + row_specs                     # mask
        args.append(mask.astype(jnp.float32))
    in_specs = in_specs + row_specs                         # X
    args.append(X.astype(jnp.float32))

    out = pl.pallas_call(
        _hals_rows_kernel(n_iter, B, Kp, TD, relu, mask is not None),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Kp, TD), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Kp, dp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, TD), jnp.float32)],
        interpret=interpret,
    )(*args)
    return out[:K, :d]


def pallas_hals_eligible(K: int, block: int = 16) -> bool:
    """The kernel holds V (and the three row tiles) in VMEM: past
    K ~ 1024 the Gram alone crowds out the tiles — fall back to XLA."""
    Kp = -(-K // block) * block
    return Kp <= 1024 and jax.default_backend() in ("tpu", "axon")
