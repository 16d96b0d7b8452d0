"""Pallas TPU kernel for the ring-background stencil.

``apply_ring`` computes, for every pixel, a weighted sum over ~R = O(2*pi*r)
ring neighbors:  out[t, h, w] = sum_r  wgt[h, w, r] * x[t, h+dy_r, w+dx_r].
The XLA fallback materializes R shifted slices of the movie; this kernel
keeps one input tile resident in VMEM and accumulates all R taps on the VPU
— one HBM read of the movie instead of R.

Layout (measured on v5e; see the variant log below): the kernel runs
TRANSPOSED, (H, T, W) — W on the lane axis, T on sublanes, the row offset
dy on the untiled outer axis (a free dynamic slice). Two hardware facts
shape this:

  * the per-tap weight must broadcast against the tap without a
    lane<->sublane transpose. Weights are stored (HT, R, W) — W already on
    lanes, R on sublanes — so ``wgt[:, r:r+1, :]`` broadcasts over the T
    sublanes for free. (In the older (H, W, T) layout this broadcast was a
    relayout per tap and dominated the kernel: 97 ms total vs 53 ms with
    the weight multiply removed.)
  * dynamic lane *slices* must be 128-aligned on TPU, but lane ROTATES
    (``pltpu.roll``) take any shift. The dx offset is therefore a
    WRAPAROUND roll over exactly W lanes — no width padding. Wraparound
    reads are harmless because out-of-FOV tap weights are zeroed here
    (``fit_ring_weights`` already returns them as 0; we re-mask for
    arbitrary callers), which reproduces the XLA zero-pad semantics
    exactly.

Variant log (256x256x2000, radius 13, R=92, v5e), kept so future rounds
don't re-walk dead ends:
  * (H, W, T) rolled loop, dynamic sublane slices      96.9 ms  (old kernel)
  * + full static unroll: ~R live temporaries          OOM (95 MB scoped)
  * + dx-grouped hoisting (v2)                        106 ms
  * + accumulator as fori carry (v4)                  118 ms
  * + tap groups of 8 per out_ref rmw (v6)            100 ms
  * bf16 movie tile: packed dtypes need 8-aligned dynamic sublane offsets
  * diagnostics: no-weights 53 ms / no-shifts 97 ms -> weight relayout
    was the bottleneck, shifts nearly free
  * transposed + per-tap roll over padded Wp=384 (v9)  82 ms
  * transposed + dx-grouped rolls, HT=32 (v10)         OOM (16 MB scoped)
  * transposed + WRAPAROUND roll over W=256 (v11)      67.8 ms  (this file)
  * v11 + HT=16                                        72.5 ms
  * v11 + dx-grouped hoisted rolls (v12)               84.6 ms — the
    scratch round-trip costs more than the per-tap rolls it saves
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cnmf_e_tpu.ops.ring import RingWeights, _neighbor_index, ring_offsets


def _ring_kernel(R, HT, W, TB, mr):
    """x_tile: (HT+2mr, TB, W) in the (H, T, W) layout; weights
    (HT, R_pad, W); w0 (HT, 1, W). The tap loop is ROLLED (offsets in
    SMEM): an unrolled loop keeps ~R out-tile-sized temporaries live and
    blows the 16 MB scoped-VMEM budget."""

    def kernel(dy_ref, shift_ref, x_hbm, wgt_ref, w0_ref, out_ref, x_tile,
               sem):
        h = pl.program_id(0)
        t = pl.program_id(1)
        # x_hbm is pre-blocked (n_tb, Hp, TB, W): scalar t index + one row
        # dynamic-slice; the copied region is full in the tiled dims
        copy = pltpu.make_async_copy(
            x_hbm.at[t, pl.ds(h * HT, HT + 2 * mr), :, :], x_tile, sem)
        copy.start()
        copy.wait()

        out_ref[:, :, :] = jnp.broadcast_to(w0_ref[:, :, :], (HT, TB, W))

        def body(r, _):
            dy = dy_ref[r]
            tap = x_tile[pl.ds(mr + dy, HT), :, :]           # (HT, TB, W)
            rolled = pltpu.roll(tap, shift_ref[r], 2)
            out_ref[:, :, :] = out_ref[:, :, :] + \
                wgt_ref[:, pl.ds(r, 1), :] * rolled
            return 0

        jax.lax.fori_loop(0, R, body, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("H", "W", "radius", "interpret"))
def apply_ring_pallas(weights: RingWeights, X: jnp.ndarray, H: int, W: int,
                      radius: int, interpret: bool = False) -> jnp.ndarray:
    """Pallas ring apply. X: (T, H, W) -> (T, H, W) (includes intercept).

    Semantically identical to ``ops.ring.apply_ring`` for ANY weights:
    out-of-FOV taps contribute zero (weights re-masked host-side, so the
    wraparound roll never leaks opposite-edge data)."""
    offsets = ring_offsets(radius)
    R = int(offsets.shape[0])
    mr = int(np.abs(offsets).max())
    T = X.shape[0]
    TB = 128
    T_pad = -(-T // TB) * TB

    HT = 8
    while H % HT:
        HT //= 2
    assert HT >= 1

    # zero out-of-FOV tap weights (fit_ring_weights already does; re-mask
    # so arbitrary weights keep exact zero-pad semantics under wraparound)
    _, valid = _neighbor_index(H, W, offsets)
    w_masked = weights.w * jnp.asarray(valid, weights.w.dtype)

    Xt = jnp.moveaxis(X, 0, 1)                        # (H, T, W)
    Xp = jnp.pad(Xt, ((mr, mr), (0, T_pad - T), (0, 0)))
    Hp = H + 2 * mr
    Xp = jnp.moveaxis(Xp.reshape(Hp, T_pad // TB, TB, W), 1, 0)

    R_pad = -(-R // 8) * 8
    wgt = jnp.moveaxis(w_masked.reshape(H, W, R), -1, 1)   # (H, R, W)
    wgt = jnp.pad(wgt, ((0, 0), (0, R_pad - R), (0, 0)))
    w0 = weights.w0.reshape(H, W)[:, None, :]               # (H, 1, W)

    dy = jnp.asarray(offsets[:, 0], jnp.int32)
    shifts = jnp.asarray((-offsets[:, 1]) % W, jnp.int32)

    grid = (H // HT, T_pad // TB)
    out = pl.pallas_call(
        _ring_kernel(R, HT, W, TB, mr),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # the movie must stay in HBM (ANY lets the compiler pick VMEM,
            # which OOMs as soon as the movie outgrows it)
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((HT, R_pad, W), lambda h, t: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HT, 1, W), lambda h, t: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((HT, TB, W), lambda h, t: (h, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, T_pad, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((HT + 2 * mr, TB, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(dy, shifts, Xp, wgt, w0)
    return jnp.moveaxis(out[:, :T], 1, 0)


def ring_apply_auto(weights: RingWeights, X: jnp.ndarray, H: int, W: int,
                    radius: int, include_intercept: bool = True
                    ) -> jnp.ndarray:
    """Use the Pallas kernel on TPU when tiling constraints hold; fall back
    to the XLA shift form otherwise."""
    from cnmf_e_tpu.ops.ring import apply_ring

    on_tpu = jax.default_backend() in ("tpu", "axon")
    lanes_ok = (W % 128 == 0) and (H % 8 == 0) and (X.shape[0] % 8 == 0)
    if on_tpu and lanes_ok:
        if not include_intercept:
            # the kernel seeds the accumulator with w0; zeros == no intercept
            weights = RingWeights(w=weights.w,
                                  w0=jnp.zeros_like(weights.w0))
        return apply_ring_pallas(weights, X, H, W, radius)
    return apply_ring(weights, X, H, W, radius,
                      include_intercept=include_intercept)
