"""Pallas TPU kernel for the ring-background stencil.

``apply_ring`` computes, for every pixel, a weighted sum over ~R = O(2*pi*r)
ring neighbors:  out[t, h, w] = sum_r  wgt[h, w, r] * x[t, h+dy_r, w+dx_r].
The XLA fallback materializes R shifted slices of the movie; this kernel
keeps one input tile resident in VMEM and accumulates all R taps on the VPU
— one HBM read of the movie instead of R.

Key Mosaic consideration: slices at arbitrary offsets along the *tiled*
(last two) dims force vector relayouts whose compile time explodes with the
tap count. So the kernel runs in a TRANSPOSED layout, (H, W, T): time sits
on the (aligned) lane axis, the row offset dy lands on the untiled outer
axis (free), and taps are grouped by column offset dx so only ~2m+1 sublane
shifts remain instead of R.

Variants measured and REJECTED on v5e (scripts_dev/ring_variants.py), for
the record — the rolled loop below is within ~2x of the VPU read floor and
none of these beat it:
  * full static unroll with accumulator chaining: Mosaic materializes every
    tap product in scoped VMEM (R ~ 92 -> 95 MB OOM), same failure as the
    original unrolled loop;
  * dx-grouped hoisting (one sublane slice per distinct dx): the hoisted
    full-height copy costs as much traffic as it saves (106 vs 97 ms);
  * accumulator as fori-loop carry instead of out_ref rmw: slower (118 ms)
    — Mosaic's rmw on a ref is already optimal;
  * bf16 movie tile (half the tap-read traffic): dynamic sublane offsets
    must be provably multiples of 8 for packed dtypes — arbitrary ring
    offsets cannot satisfy that; TB=256 lane blocks: scoped-VMEM OOM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cnmf_e_tpu.ops.ring import RingWeights, ring_offsets


def _ring_kernel_T(R, HT, W, TB, mr, mc):
    """Kernel in (H, W, T) layout. x_tile: (HT+2mr, W+2mc, TB).

    The tap loop is ROLLED (``fori_loop`` with the offsets read from SMEM):
    an unrolled loop keeps ~R out-tile-sized temporaries live and blows the
    scoped-VMEM budget (R ~ 92 -> ~95 MB). Row offsets land on the untiled
    outer axis (free dynamic slice); column offsets are one dynamic sublane
    slice per tap.
    """

    def kernel(dy_ref, dx_ref, x_hbm, wgt_ref, w0_ref, out_ref, x_tile,
               sem):
        h = pl.program_id(0)
        t = pl.program_id(1)
        # x_hbm is pre-blocked (n_tb, Hp, Wp, TB): a scalar t index + one
        # row dynamic-slice keeps the DMA from materializing a full-T
        # intermediate (two ds dims made Mosaic stage a (rows, Wp, T) copy)
        copy = pltpu.make_async_copy(
            x_hbm.at[t, pl.ds(h * HT, HT + 2 * mr), :, :],
            x_tile, sem)
        copy.start()
        copy.wait()

        out_ref[:, :, :] = jnp.broadcast_to(w0_ref[:, :][:, :, None],
                                            (HT, W, TB))

        def body(r, _):
            dy = dy_ref[r]
            dx = dx_ref[r]
            tap = x_tile[pl.ds(mr + dy, HT), pl.ds(mc + dx, W), :]
            out_ref[:, :, :] = out_ref[:, :, :] + \
                wgt_ref[r][:, :, None] * tap
            return 0

        jax.lax.fori_loop(0, R, body, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("H", "W", "radius", "interpret"))
def apply_ring_pallas(weights: RingWeights, X: jnp.ndarray, H: int, W: int,
                      radius: int, interpret: bool = False) -> jnp.ndarray:
    """Pallas ring apply. X: (T, H, W) -> (T, H, W) (includes intercept)."""
    offsets = ring_offsets(radius)
    m = int(np.abs(offsets).max())
    # alignment: in (H, W, T) layout the tiled dims are (W+2mc, T-block).
    # DMA slice shapes must align to (8, 128): keep W+2mc a multiple of 8
    # and always move full 128-frame lane blocks; rows (dim 0) are untiled.
    mc = -(-m // 4) * 4
    mr = m
    T = X.shape[0]
    TB = 128
    T_pad = -(-T // TB) * TB

    HT = 8
    while H % HT:
        HT //= 2
    assert HT >= 1

    Xt = jnp.moveaxis(X, 0, -1)                       # (H, W, T)
    Xpad = jnp.pad(Xt, ((mr, mr), (mc, mc), (0, T_pad - T)))
    # pre-block time: (n_tb, Hp, Wp, TB)
    Hp, Wp = H + 2 * mr, W + 2 * mc
    Xpad = jnp.moveaxis(
        Xpad.reshape(Hp, Wp, T_pad // TB, TB), 2, 0)
    # weights laid out (R, H, W): the per-tap index r lands on the untiled
    # leading axis (a lane-dim index would need 128-aligned slicing)
    wgt = jnp.moveaxis(weights.w.reshape(H, W, -1), -1, 0)
    w0 = weights.w0.reshape(H, W)

    dy = jnp.asarray(offsets[:, 0], jnp.int32)
    dx = jnp.asarray(offsets[:, 1], jnp.int32)

    grid = (H // HT, T_pad // TB)
    out = pl.pallas_call(
        _ring_kernel_T(int(offsets.shape[0]), HT, W, TB, mr, mc),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # the movie must stay in HBM (ANY lets the compiler pick VMEM,
            # which OOMs as soon as the movie outgrows it)
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((offsets.shape[0], HT, W),
                         lambda h, t: (0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HT, W), lambda h, t: (h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((HT, W, TB), lambda h, t: (h, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, T_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((HT + 2 * mr, W + 2 * mc, TB), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(dy, dx, Xpad, wgt, w0)
    return jnp.moveaxis(out[:, :, :T], -1, 0)


def ring_apply_auto(weights: RingWeights, X: jnp.ndarray, H: int, W: int,
                    radius: int, include_intercept: bool = True
                    ) -> jnp.ndarray:
    """Use the Pallas kernel on TPU when tiling constraints hold; fall back
    to the XLA shift form otherwise."""
    from cnmf_e_tpu.ops.ring import apply_ring

    on_tpu = jax.default_backend() in ("tpu", "axon")
    lanes_ok = (W % 128 == 0) and (H % 8 == 0) and (X.shape[0] % 8 == 0)
    if on_tpu and lanes_ok and include_intercept:
        return apply_ring_pallas(weights, X, H, W, radius)
    return apply_ring(weights, X, H, W, radius,
                      include_intercept=include_intercept)
