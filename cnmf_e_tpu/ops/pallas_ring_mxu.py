"""MXU (matmul) formulation of the ring-background stencil.

The VPU kernel (ops/pallas_ring.py) pays ~3 vector ops per tap per element
(roll + multiply + accumulate) — at R~92 taps it is VPU-throughput-bound.
This module instead casts the spatially-varying stencil as banded matmuls:
for every output row h and every row offset dy,

    out[h] (T, W)  +=  x[h+dy] (T, W) @ B[h, dy] (W, W)

where ``B[h, dy][w', w] = wgt[h, w, tap(dy, w' - w)]`` holds that row's ring
weights on (off-)diagonals (zero elsewhere, including out-of-FOV taps — the
same zero-pad semantics as the XLA/VPU forms). The dense band matrices are
~90% zeros, but the MXU's bf16 throughput is ~2 orders of magnitude above
the VPU's f32 rate, so the wasted FLOPs still buy ~2x wall clock on the
movie-sized pass. Precision: taps and bands are bf16, accumulation f32 —
relative error ~1e-3 on the background estimate, far below the data noise
the background model absorbs (validated in tests/test_pallas_ring.py).

The band tensor depends only on the ring weights — constant between
background refreshes — so ``ring_dense_bands`` is built once per refresh
and reused by every projection/GA application (see parallel/step.py).

Reference behavior being re-designed: the per-pixel ring regression apply
``W * (Y - b0 - A C)`` inside ``update_spatial_parallel.m:157-188`` /
``fit_ring_model.m:92-126``.

Layout notes (v5e):
  * grid (h, t) with t innermost: the 3.5 MB band block for row h stays
    VMEM-resident across all T tiles (fetched once per h, ~900 MB total);
    the movie slab (27, TB, W) is the streamed operand
  * the x slab rows [h, h+2mr] overlap between consecutive h — BlockSpec
    index maps cannot express overlapping blocks, so the slab is a manual
    double-buffered async copy from HBM (prefetch t+1 during the matmuls
    of t)
  * band slices ``B[d*W:(d+1)*W]`` sit on sublane boundaries (multiples of
    W >= 256), satisfying bf16's 16-row alignment for dynamic slices
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cnmf_e_tpu.ops.ring import RingWeights, _neighbor_index, ring_offsets


def ring_dense_bands(weights: RingWeights, H: int, W: int, radius: int
                     ) -> jnp.ndarray:
    """Build the banded matmul operand: (H, D*W, W) bf16, D = 2*mr + 1.

    Row block d (= dy + mr) holds B[h, dy][w', w] = wgt[h, w, r(dy, w'-w)]
    for ring taps (dy, dx = w'-w); zero elsewhere. Out-of-FOV taps are
    zeroed (same mask as the VPU/XLA forms).
    """
    offsets = ring_offsets(radius)
    R = int(offsets.shape[0])
    mr = int(np.abs(offsets).max())
    D = 2 * mr + 1
    _, valid = _neighbor_index(H, W, offsets)
    wm = (weights.w * jnp.asarray(valid, weights.w.dtype)).reshape(H, W, R)

    # one scatter of the H*W*R weights into the (H, D, W, W) band tensor:
    # bands[h, dy+mr, w+dx, w] = wm[h, w, r]. (The earlier dense build —
    # one (H, W, W) fma per tap — moved ~12 GB through HBM at 256^2/R=92
    # and dominated the per-refresh projection cost.)
    wcol = np.arange(W)
    d_idx = np.broadcast_to((offsets[:, 0] + mr)[None, :], (W, R))
    row_idx = wcol[:, None] + offsets[None, :, 1]          # (W, R)
    col_idx = np.broadcast_to(wcol[:, None], (W, R))
    bands = jnp.zeros((H, D, W, W), jnp.bfloat16)
    # out-of-FOV columns (row_idx outside [0, W)) are dropped by the
    # scatter itself; index triples are otherwise unique per (w, r)
    bands = bands.at[:, jnp.asarray(d_idx), jnp.asarray(row_idx),
                     jnp.asarray(col_idx)].set(
        wm.astype(jnp.bfloat16), mode="drop")
    return bands.reshape(H, D * W, W)


def _mxu_kernel(D, W, TB):
    def kernel(x_hbm, band_ref, w0_ref, out_ref, xa, xb, sa, sb):
        h = pl.program_id(0)
        t = pl.program_id(1)
        nt = pl.num_programs(1)

        # double-buffered slab: copy for tile t was started at t-1 (or
        # here for t == 0); start the prefetch for t+1 before computing
        def make(tile, buf, sem):
            return pltpu.make_async_copy(
                x_hbm.at[tile, pl.ds(h, D), :, :], buf, sem)

        parity = t % 2

        @pl.when(t == 0)
        def _start_first():
            make(t, xa, sa).start()

        @pl.when(t + 1 < nt)
        def _prefetch():
            @pl.when(parity == 0)
            def _():
                make(t + 1, xb, sb).start()

            @pl.when(parity == 1)
            def _():
                make(t + 1, xa, sa).start()

        acc0 = jnp.broadcast_to(w0_ref[0, :, :], (TB, W)).astype(jnp.float32)

        def compute(buf):
            def body(d, acc):
                xd = buf[d]                                   # (TB, W) bf16
                Bd = band_ref[0, pl.ds(d * W, W), :]          # (W, W) bf16
                return acc + jnp.dot(xd, Bd,
                                     preferred_element_type=jnp.float32)
            return jax.lax.fori_loop(0, D, body, acc0)

        @pl.when(parity == 0)
        def _use_a():
            make(t, xa, sa).wait()
            out_ref[0, :, :] = compute(xa)

        @pl.when(parity == 1)
        def _use_b():
            make(t, xb, sb).wait()
            out_ref[0, :, :] = compute(xb)

    return kernel


def _mxu_flat_kernel(DW, W, TB):
    def kernel(x_hbm, band_ref, w0_ref, out_ref, xa, xb, sa, sb):
        h = pl.program_id(0)
        t = pl.program_id(1)
        nt = pl.num_programs(1)

        def make(tile, buf, sem):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(tile * TB, TB), pl.ds(h * W, DW)], buf, sem)

        parity = t % 2

        @pl.when(t == 0)
        def _start_first():
            make(t, xa, sa).start()

        @pl.when(t + 1 < nt)
        def _prefetch():
            @pl.when(parity == 0)
            def _():
                make(t + 1, xb, sb).start()

            @pl.when(parity == 1)
            def _():
                make(t + 1, xa, sa).start()

        w0b = jnp.broadcast_to(w0_ref[0, :, :], (TB, W)).astype(jnp.float32)

        def compute(buf):
            return w0b + jnp.dot(buf[...], band_ref[0],
                                 preferred_element_type=jnp.float32)

        @pl.when(parity == 0)
        def _use_a():
            make(t, xa, sa).wait()
            out_ref[...] = compute(xa)

        @pl.when(parity == 1)
        def _use_b():
            make(t, xb, sb).wait()
            out_ref[...] = compute(xb)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("H", "W", "radius", "interpret"))
def apply_ring_mxu_flat(bands: jnp.ndarray, w0: jnp.ndarray, X: jnp.ndarray,
                        H: int, W: int, radius: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Banded-matmul ring apply, flat layout. X: (T, H, W) -> (T, H, W).

    Unlike :func:`apply_ring_mxu` this keeps the movie in its natural
    (T, H*W) layout — the row band for output row h is the CONTIGUOUS lane
    slice [h*W, (h+D)*W) of the mr-row-padded flat movie, so the kernel
    needs no (T,H,W)->(H,T,W) relayout on either side (measured ~30 ms per
    movie pass at 256x256x2000, as much as the matmuls themselves) and the
    D-loop of (TB,W)x(W,W) matmuls becomes ONE (TB, D*W)x(D*W, W) MXU
    call. Dynamic lane offset h*W is a provable multiple of 128 for the
    W % 128 == 0 FOVs this path serves.
    """
    offsets = ring_offsets(radius)
    mr = int(np.abs(offsets).max())
    D = 2 * mr + 1
    T = X.shape[0]
    TB = 128
    T_pad = -(-T // TB) * TB

    Xf = X.reshape(T, H * W).astype(jnp.bfloat16)
    Xp = jnp.pad(Xf, ((0, T_pad - T), (mr * W, mr * W)))
    w0r = w0.reshape(H, 1, W).astype(jnp.float32)

    grid = (H, T_pad // TB)
    out = pl.pallas_call(
        _mxu_flat_kernel(D * W, W, TB),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, D * W, W), lambda h, t: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W), lambda h, t: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, W), lambda h, t: (t, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, H * W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TB, D * W), jnp.bfloat16),
            pltpu.VMEM((TB, D * W), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(Xp, bands, w0r)
    return out[:T].reshape(T, H, W)


@functools.partial(jax.jit,
                   static_argnames=("H", "W", "radius", "interpret"))
def apply_ring_mxu(bands: jnp.ndarray, w0: jnp.ndarray, X: jnp.ndarray,
                   H: int, W: int, radius: int,
                   interpret: bool = False) -> jnp.ndarray:
    """Banded-matmul ring apply. X: (T, H, W) f32 -> (T, H, W) f32
    (intercept w0 included; pass zeros to drop it).

    ``bands``: from :func:`ring_dense_bands` (constant between background
    refreshes). Taps compute in bf16 on the MXU, accumulate in f32.
    """
    offsets = ring_offsets(radius)
    mr = int(np.abs(offsets).max())
    D = 2 * mr + 1
    T = X.shape[0]
    TB = 128
    T_pad = -(-T // TB) * TB

    Xt = jnp.moveaxis(X, 0, 1).astype(jnp.bfloat16)       # (H, T, W)
    Xp = jnp.pad(Xt, ((mr, mr), (0, T_pad - T), (0, 0)))
    Hp = H + 2 * mr
    Xp = jnp.moveaxis(Xp.reshape(Hp, T_pad // TB, TB, W), 1, 0)

    w0r = w0.reshape(H, 1, W).astype(jnp.float32)

    grid = (H, T_pad // TB)
    out = pl.pallas_call(
        _mxu_kernel(D, W, TB),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, D * W, W), lambda h, t: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W), lambda h, t: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TB, W), lambda h, t: (h, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, T_pad, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((D, TB, W), jnp.bfloat16),
            pltpu.VMEM((D, TB, W), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(Xp, bands, w0r)
    return jnp.moveaxis(out[:, :T], 1, 0)
