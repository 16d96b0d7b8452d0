"""Pallas TPU kernel for the ring-background stencil.

``apply_ring`` computes, for every pixel, a weighted sum over ~R = O(2*pi*r)
ring neighbors:  out[t, h, w] = sum_r  wgt[h, w, r] * x[t, h+dy_r, w+dx_r].
The XLA fallback materializes R shifted slices of the movie; this kernel
keeps one (TB, HT+2m, W+2m) input tile resident in VMEM and accumulates all
R taps on the VPU — one HBM read of the movie instead of R.

Layout: grid (T/TB, H/HT); the padded movie stays in ANY/HBM and each
program DMAs its tile (with halo) into VMEM scratch; per-pixel weights are
block-mapped by row tile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cnmf_e_tpu.ops.ring import RingWeights, ring_offsets


def _ring_kernel(offsets, TB, HT, W, mr, mc):
    R = offsets.shape[0]

    def kernel(x_hbm, wgt_ref, w0_ref, out_ref, x_tile, sem):
        t = pl.program_id(0)
        h = pl.program_id(1)
        copy = pltpu.make_async_copy(
            x_hbm.at[pl.ds(t * TB, TB), pl.ds(h * HT, HT + 2 * mr), :],
            x_tile, sem)
        copy.start()
        copy.wait()

        acc = jnp.zeros((TB, HT, W), jnp.float32)
        for r in range(R):
            dy, dx = int(offsets[r, 0]), int(offsets[r, 1])
            tap = x_tile[:, mr + dy:mr + dy + HT, mc + dx:mc + dx + W]
            acc = acc + wgt_ref[:, :, r][None] * tap
        out_ref[:, :, :] = acc + w0_ref[:, :][None]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("H", "W", "radius", "interpret"))
def apply_ring_pallas(weights: RingWeights, X: jnp.ndarray, H: int, W: int,
                      radius: int, interpret: bool = False) -> jnp.ndarray:
    """Pallas ring apply. X: (T, H, W) -> (T, H, W) (includes intercept)."""
    offsets = ring_offsets(radius)
    m = int(np.abs(offsets).max())
    # align the halo so DMA tile shapes respect the (8, 128) f32 tiling:
    # rows: tile height HT + 2*mr must be a multiple of 8;
    # cols: tile width W + 2*mc must be a multiple of 128
    mr = -(-m // 4) * 4
    mc = -(-m // 64) * 64
    T = X.shape[0]

    # tile sizes: keep the input tile + accumulator within VMEM
    TB = 8
    while T % TB:
        TB //= 2
    HT = 32
    while H % HT:
        HT //= 2
    assert TB >= 1 and HT >= 1

    Xpad = jnp.pad(X, ((0, 0), (mr, mr), (mc, mc)))
    wgt = weights.w.reshape(H, W, -1)
    w0 = weights.w0.reshape(H, W)

    grid = (T // TB, H // HT)
    out = pl.pallas_call(
        _ring_kernel(offsets, TB, HT, W, mr, mc),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((HT, W, offsets.shape[0]),
                         lambda t, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HT, W), lambda t, h: (h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, HT, W), lambda t, h: (t, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TB, HT + 2 * mr, W + 2 * mc), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(Xpad, wgt, w0)
    return out


def ring_apply_auto(weights: RingWeights, X: jnp.ndarray, H: int, W: int,
                    radius: int, include_intercept: bool = True
                    ) -> jnp.ndarray:
    """Use the Pallas kernel on TPU when tiling constraints hold; fall back
    to the XLA shift form otherwise."""
    from cnmf_e_tpu.ops.ring import apply_ring

    on_tpu = jax.default_backend() in ("tpu", "axon")
    lanes_ok = (W % 128 == 0) and (H % 8 == 0) and (X.shape[0] % 2 == 0)
    if on_tpu and lanes_ok and include_intercept:
        return apply_ring_pallas(weights, X, H, W, radius)
    return apply_ring(weights, X, H, W, radius,
                      include_intercept=include_intercept)
