"""Experimental ring-stencil kernel variants (dev tool).

V3: fully static unrolled tap loop with accumulator chaining — offsets
baked into the program, static slices, no SMEM indirection.
V2: taps grouped by column offset dx — one dynamic sublane slice per dx,
free row slices within the group.
"""
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cnmf_e_tpu.ops.ring import RingWeights, ring_offsets


def _kernel_v3(offsets, HT, W, TB, mr, mc):
    """Static unroll with acc chaining."""
    offs = [(int(dy), int(dx)) for dy, dx in offsets]

    def kernel(x_hbm, wgt_ref, w0_ref, out_ref, x_tile, sem):
        h = pl.program_id(0)
        t = pl.program_id(1)
        copy = pltpu.make_async_copy(
            x_hbm.at[t, pl.ds(h * HT, HT + 2 * mr), :, :], x_tile, sem)
        copy.start()
        copy.wait()
        acc = jnp.broadcast_to(w0_ref[:, :][:, :, None], (HT, W, TB))
        for r, (dy, dx) in enumerate(offs):
            tap = x_tile[mr + dy:mr + dy + HT, mc + dx:mc + dx + W, :]
            acc = acc + wgt_ref[r][:, :, None] * tap
        out_ref[:, :, :] = acc

    return kernel


def _kernel_v2(dx_vals, starts, counts, dy_all, HT, W, TB, mr, mc):
    """dx-grouped: hoisted sublane slice per dx, rolled dy loop."""
    n_dx = len(dx_vals)

    def kernel(dxv_ref, st_ref, ct_ref, dy_ref, x_hbm, wgt_ref, w0_ref,
               out_ref, x_tile, x_dx, sem):
        h = pl.program_id(0)
        t = pl.program_id(1)
        copy = pltpu.make_async_copy(
            x_hbm.at[t, pl.ds(h * HT, HT + 2 * mr), :, :], x_tile, sem)
        copy.start()
        copy.wait()
        out_ref[:, :, :] = jnp.broadcast_to(w0_ref[:, :][:, :, None],
                                            (HT, W, TB))

        def dx_body(j, _):
            dx = dxv_ref[j]
            x_dx[:, :, :] = x_tile[:, pl.ds(mc + dx, W), :]
            s = st_ref[j]

            def dy_body(i, _):
                r = s + i
                dy = dy_ref[r]
                tap = x_dx[pl.ds(mr + dy, HT), :, :]
                out_ref[:, :, :] = out_ref[:, :, :] + \
                    wgt_ref[r][:, :, None] * tap
                return 0

            jax.lax.fori_loop(0, ct_ref[j], dy_body, 0)
            return 0

        jax.lax.fori_loop(0, n_dx, dx_body, 0)

    return kernel


def _kernel_v5(R, HT, W, TB, mr, mc):
    """Current rolled kernel with the movie tile in bf16 (half the tap-read
    traffic; f32 weights and accumulator)."""

    def kernel(dy_ref, dx_ref, x_hbm, wgt_ref, w0_ref, out_ref, x_tile,
               sem):
        h = pl.program_id(0)
        t = pl.program_id(1)
        copy = pltpu.make_async_copy(
            x_hbm.at[t, pl.ds(h * HT, HT + 2 * mr), :, :], x_tile, sem)
        copy.start()
        copy.wait()

        out_ref[:, :, :] = jnp.broadcast_to(w0_ref[:, :][:, :, None],
                                            (HT, W, TB))

        def body(r, _):
            dy = dy_ref[r]
            dx = dx_ref[r]
            tap = x_tile[pl.ds(mr + dy, HT), pl.ds(mc + dx, W), :]
            out_ref[:, :, :] = out_ref[:, :, :] + \
                wgt_ref[r][:, :, None] * tap.astype(jnp.float32)
            return 0

        jax.lax.fori_loop(0, R, body, 0)

    return kernel


def _kernel_v6(R_pad, G, HT, W, TB, mr, mc):
    """Current layout, taps partially unrolled in groups of G: one out_ref
    read-modify-write per G taps instead of per tap (R is zero-padded to a
    multiple of G with zero-weight taps)."""
    n_grp = R_pad // G

    def kernel(dy_ref, dx_ref, x_hbm, wgt_ref, w0_ref, out_ref, x_tile,
               sem):
        h = pl.program_id(0)
        t = pl.program_id(1)
        copy = pltpu.make_async_copy(
            x_hbm.at[t, pl.ds(h * HT, HT + 2 * mr), :, :], x_tile, sem)
        copy.start()
        copy.wait()

        out_ref[:, :, :] = jnp.broadcast_to(w0_ref[:, :][:, :, None],
                                            (HT, W, TB))

        def body(j, _):
            r0 = j * G
            acc = wgt_ref[r0][:, :, None] * \
                x_tile[pl.ds(mr + dy_ref[r0], HT),
                       pl.ds(mc + dx_ref[r0], W), :]
            for i in range(1, G):
                r = r0 + i
                acc = acc + wgt_ref[r][:, :, None] * \
                    x_tile[pl.ds(mr + dy_ref[r], HT),
                           pl.ds(mc + dx_ref[r], W), :]
            out_ref[:, :, :] = out_ref[:, :, :] + acc
            return 0

        jax.lax.fori_loop(0, n_grp, body, 0)

    return kernel


def _kernel_v78(R_pad, G, HT, W, TB, mr, mc):
    """TRANSPOSED layout (H, T, W): W sits on lanes, T on sublanes. The
    per-tap weight broadcast becomes a free sublane broadcast (weights are
    stored (R, HT, 1, W) so no lane<->sublane transpose is needed); dx
    becomes a dynamic LANE slice. G = tap-group unroll as in v6."""
    n_grp = R_pad // G

    def kernel(dy_ref, dx_ref, x_hbm, wgt_ref, w0_ref, out_ref, x_tile,
               sem):
        h = pl.program_id(0)
        t = pl.program_id(1)
        copy = pltpu.make_async_copy(
            x_hbm.at[t, pl.ds(h * HT, HT + 2 * mr), :, :], x_tile, sem)
        copy.start()
        copy.wait()

        out_ref[:, :, :] = jnp.broadcast_to(w0_ref[:, :, :], (HT, TB, W))

        def body(j, _):
            r0 = j * G
            acc = wgt_ref[r0] * x_tile[pl.ds(mr + dy_ref[r0], HT), :,
                                       pl.ds(mc + dx_ref[r0], W)]
            for i in range(1, G):
                r = r0 + i
                acc = acc + wgt_ref[r] * \
                    x_tile[pl.ds(mr + dy_ref[r], HT), :,
                           pl.ds(mc + dx_ref[r], W)]
            out_ref[:, :, :] = out_ref[:, :, :] + acc
            return 0

        jax.lax.fori_loop(0, n_grp, body, 0)

    return kernel


def _kernel_v9(R, HT, W, TB, mr, mc, Wp):
    """Transposed layout (H, T, W) with the dx shift as a lane ROTATE
    (pltpu.roll) — dynamic lane *slices* must be 128-aligned, rotates are
    not restricted. Weights are (R, HT, 1, W): sublane broadcast, no
    transpose."""

    def kernel(dy_ref, dx_ref, x_hbm, wgt_ref, w0_ref, out_ref, x_tile,
               sem):
        h = pl.program_id(0)
        t = pl.program_id(1)
        copy = pltpu.make_async_copy(
            x_hbm.at[t, pl.ds(h * HT, HT + 2 * mr), :, :], x_tile, sem)
        copy.start()
        copy.wait()

        out_ref[:, :, :] = jnp.broadcast_to(w0_ref[:, :, :], (HT, TB, W))

        def body(r, _):
            dy = dy_ref[r]
            dx = dx_ref[r]
            tap_full = x_tile[pl.ds(mr + dy, HT), :, :]      # (HT, TB, Wp)
            # want rolled[w] = tap[w + mc + dx]; pltpu.roll needs a
            # non-negative shift, so use the congruent Wp - (mc + dx)
            rolled = pltpu.roll(tap_full, Wp - (mc + dx), 2)
            out_ref[:, :, :] = out_ref[:, :, :] + \
                wgt_ref[r] * rolled[:, :, :W]
            return 0

        jax.lax.fori_loop(0, R, body, 0)

    return kernel


def _kernel_v10(groups, HT, W, TB, mr, mc, Wp):
    """Transposed layout + dx-grouped STATIC rolls: one lane rotate of the
    full tile per distinct dx (27 for radius 13) instead of one per tap
    (92), hoisted into scratch; dy slices stay free. Taps must be
    pre-sorted by dx. groups: [(dx, start, count)] static."""

    def kernel(dy_ref, x_hbm, wgt_ref, w0_ref, out_ref, x_tile, x_dx, sem):
        h = pl.program_id(0)
        t = pl.program_id(1)
        copy = pltpu.make_async_copy(
            x_hbm.at[t, pl.ds(h * HT, HT + 2 * mr), :, :], x_tile, sem)
        copy.start()
        copy.wait()

        out_ref[:, :, :] = jnp.broadcast_to(w0_ref[:, :, :], (HT, TB, W))

        for dx, start, count in groups:
            x_dx[:, :, :] = pltpu.roll(
                x_tile[:, :, :], Wp - (mc + dx), 2)[:, :, :W]

            def dy_body(i, _, start=start):
                r = start + i
                tap = x_dx[pl.ds(mr + dy_ref[r], HT), :, :]
                out_ref[:, :, :] = out_ref[:, :, :] + wgt_ref[r] * tap
                return 0

            jax.lax.fori_loop(0, count, dy_body, 0)

    return kernel


def _kernel_v11(R, HT, W, TB, mr):
    """Transposed layout (H, T, W), NO width padding: the dx shift is a
    WRAPAROUND lane roll on exactly W lanes. Out-of-FOV contributions are
    killed by zeroing the border weights host-side (same semantics as the
    XLA zero-pad form). Weights live as (HT, R, W) blocks: R on sublanes —
    no pad waste, and wgt[:, r:r+1, :] broadcasts over TB sublanes for
    free."""

    def kernel(dy_ref, shift_ref, x_hbm, wgt_ref, w0_ref, out_ref, x_tile,
               sem):
        h = pl.program_id(0)
        t = pl.program_id(1)
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


def _kernel_v12(groups, HT, W, TB, mr):
    """v11 + dx-grouped rolls: one static wraparound roll of the full tile
    per distinct dx (27 for radius 13) hoisted into scratch, instead of one
    roll per tap (92). Taps pre-sorted by dx; weights as (HT, R, W)."""

    def kernel(dy_ref, x_hbm, wgt_ref, w0_ref, out_ref, x_tile, x_dx, sem):
        h = pl.program_id(0)
        t = pl.program_id(1)
        copy = pltpu.make_async_copy(
            x_hbm.at[t, pl.ds(h * HT, HT + 2 * mr), :, :], x_tile, sem)
        copy.start()
        copy.wait()

        out_ref[:, :, :] = jnp.broadcast_to(w0_ref[:, :, :], (HT, TB, W))

        for dx, start, count in groups:
            x_dx[:, :, :] = pltpu.roll(x_tile[:, :, :], (-dx) % W, 2)

            def dy_body(i, _, start=start):
                r = start + i
                tap = x_dx[pl.ds(mr + dy_ref[r], HT), :, :]
                out_ref[:, :, :] = out_ref[:, :, :] + \
                    wgt_ref[:, pl.ds(r, 1), :] * tap
                return 0

            jax.lax.fori_loop(0, count, dy_body, 0)

    return kernel


def _kernel_diag(R, HT, W, TB, mr, mc, use_wgt, use_shift):
    """DIAGNOSTIC kernels (wrong results on purpose): isolate the per-tap
    cost. use_wgt=False drops the weight broadcast; use_shift=False reads
    every tap at (0, 0)."""

    def kernel(dy_ref, dx_ref, x_hbm, wgt_ref, w0_ref, out_ref, x_tile,
               sem):
        h = pl.program_id(0)
        t = pl.program_id(1)
        copy = pltpu.make_async_copy(
            x_hbm.at[t, pl.ds(h * HT, HT + 2 * mr), :, :], x_tile, sem)
        copy.start()
        copy.wait()

        out_ref[:, :, :] = jnp.broadcast_to(w0_ref[:, :][:, :, None],
                                            (HT, W, TB))

        def body(r, _):
            if use_shift:
                tap = x_tile[pl.ds(mr + dy_ref[r], HT),
                             pl.ds(mc + dx_ref[r], W), :]
            else:
                tap = x_tile[mr:mr + HT, mc:mc + W, :]
            if use_wgt:
                out_ref[:, :, :] = out_ref[:, :, :] + \
                    wgt_ref[r][:, :, None] * tap
            else:
                out_ref[:, :, :] = out_ref[:, :, :] + tap
            return 0

        jax.lax.fori_loop(0, R, body, 0)

    return kernel


def _kernel_v4(R, HT, W, TB, mr, mc):
    """Current rolled kernel, accumulator as fori carry (value, not ref)."""

    def kernel(dy_ref, dx_ref, x_hbm, wgt_ref, w0_ref, out_ref, x_tile,
               sem):
        h = pl.program_id(0)
        t = pl.program_id(1)
        copy = pltpu.make_async_copy(
            x_hbm.at[t, pl.ds(h * HT, HT + 2 * mr), :, :], x_tile, sem)
        copy.start()
        copy.wait()

        def body(r, acc):
            dy = dy_ref[r]
            dx = dx_ref[r]
            tap = x_tile[pl.ds(mr + dy, HT), pl.ds(mc + dx, W), :]
            return acc + wgt_ref[r][:, :, None] * tap

        acc0 = jnp.broadcast_to(w0_ref[:, :][:, :, None], (HT, W, TB))
        out_ref[:, :, :] = jax.lax.fori_loop(0, R, body, acc0)

    return kernel


@functools.partial(jax.jit, static_argnames=("H", "W", "radius", "variant",
                                             "TB"))
def apply_ring_variant(weights, X, H, W, radius, variant="v3", TB=128):
    offsets = ring_offsets(radius)
    m = int(np.abs(offsets).max())
    mc = -(-m // 4) * 4
    mr = m
    T = X.shape[0]
    T_pad = -(-T // TB) * TB
    HT = 8
    while H % HT:
        HT //= 2

    Xt = jnp.moveaxis(X, 0, -1)
    Xpad = jnp.pad(Xt, ((mr, mr), (mc, mc), (0, T_pad - T)))
    Hp, Wp = H + 2 * mr, W + 2 * mc
    Xpad = jnp.moveaxis(Xpad.reshape(Hp, Wp, T_pad // TB, TB), 2, 0)
    w0 = weights.w0.reshape(H, W)
    grid = (H // HT, T_pad // TB)

    if variant == "v12":
        R = int(offsets.shape[0])
        from cnmf_e_tpu.ops.ring import _neighbor_index
        _, valid = _neighbor_index(H, W, offsets)
        order = np.lexsort((offsets[:, 0], offsets[:, 1]))
        offs_s = offsets[order]
        groups = []
        i = 0
        while i < len(offs_s):
            j = i
            while j < len(offs_s) and offs_s[j, 1] == offs_s[i, 1]:
                j += 1
            groups.append((int(offs_s[i, 1]), i, j - i))
            i = j
        w_masked = (weights.w * jnp.asarray(valid, weights.w.dtype))[:, order]
        Xt = jnp.moveaxis(X, 0, 1)
        Xp = jnp.pad(Xt, ((mr, mr), (0, T_pad - T), (0, 0)))
        Hp = H + 2 * mr
        Xp = jnp.moveaxis(Xp.reshape(Hp, T_pad // TB, TB, W), 1, 0)
        R_pad = -(-R // 8) * 8
        wgt = jnp.moveaxis(w_masked.reshape(H, W, R), -1, 1)
        wgt = jnp.pad(wgt, ((0, 0), (0, R_pad - R), (0, 0)))
        w011 = weights.w0.reshape(H, W)[:, None, :]
        dy = jnp.asarray(offs_s[:, 0], jnp.int32)
        out = pl.pallas_call(
            _kernel_v12(groups, HT, W, TB, mr),
            grid=(H // HT, T_pad // TB),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
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
                pltpu.VMEM((HT + 2 * mr, TB, W), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(dy, Xp, wgt, w011)
        return jnp.moveaxis(out[:, :T], 1, 0)
    if variant in ("v11", "v11h16"):
        HT11 = 16 if (variant == "v11h16" and H % 16 == 0) else HT
        R = int(offsets.shape[0])
        from cnmf_e_tpu.ops.ring import _neighbor_index
        _, valid = _neighbor_index(H, W, offsets)
        w_masked = weights.w * jnp.asarray(valid, weights.w.dtype)
        Xt = jnp.moveaxis(X, 0, 1)                        # (H, T, W)
        Xp = jnp.pad(Xt, ((mr, mr), (0, T_pad - T), (0, 0)))
        Hp = H + 2 * mr
        Xp = jnp.moveaxis(Xp.reshape(Hp, T_pad // TB, TB, W), 1, 0)
        R_pad = -(-R // 8) * 8
        wgt = jnp.moveaxis(w_masked.reshape(H, W, R), -1, 1)  # (H, R, W)
        wgt = jnp.pad(wgt, ((0, 0), (0, R_pad - R), (0, 0)))
        w011 = weights.w0.reshape(H, W)[:, None, :]
        dy = jnp.asarray(offsets[:, 0], jnp.int32)
        shifts = jnp.asarray((-offsets[:, 1]) % W, jnp.int32)
        out = pl.pallas_call(
            _kernel_v11(R, HT11, W, TB, mr),
            grid=(H // HT11, T_pad // TB),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((HT11, R_pad, W), lambda h, t: (h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((HT11, 1, W), lambda h, t: (h, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((HT11, TB, W), lambda h, t: (h, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, T_pad, W), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((HT11 + 2 * mr, TB, W), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(dy, shifts, Xp, wgt, w011)
        return jnp.moveaxis(out[:, :T], 1, 0)
    if variant == "v10":
        HT10 = 32 if H % 32 == 0 else HT
        Wp = -(-(W + 2 * m) // 128) * 128
        mc10 = (Wp - W) // 2
        order = np.lexsort((offsets[:, 0], offsets[:, 1]))
        offs_s = offsets[order]
        groups = []
        i = 0
        while i < len(offs_s):
            j = i
            while j < len(offs_s) and offs_s[j, 1] == offs_s[i, 1]:
                j += 1
            groups.append((int(offs_s[i, 1]), i, j - i))
            i = j
        Xt7 = jnp.moveaxis(X, 0, 1)
        Xp7 = jnp.pad(Xt7, ((mr, mr), (0, T_pad - T), (mc10, Wp - W - mc10)))
        Hp = H + 2 * mr
        Xp7 = jnp.moveaxis(Xp7.reshape(Hp, T_pad // TB, TB, Wp), 1, 0)
        wgt = jnp.moveaxis(weights.w.reshape(H, W, -1), -1, 0)[order]
        wgt = wgt[:, :, None, :]
        w07 = weights.w0.reshape(H, W)[:, None, :]
        dy = jnp.asarray(offs_s[:, 0], jnp.int32)
        R = int(offsets.shape[0])
        out = pl.pallas_call(
            _kernel_v10(groups, HT10, W, TB, mr, mc10, Wp),
            grid=(H // HT10, T_pad // TB),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((R, HT10, 1, W), lambda h, t: (0, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((HT10, 1, W), lambda h, t: (h, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((HT10, TB, W), lambda h, t: (h, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, T_pad, W), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((HT10 + 2 * mr, TB, Wp), jnp.float32),
                pltpu.VMEM((HT10 + 2 * mr, TB, W), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(dy, Xp7, wgt, w07)
        return jnp.moveaxis(out[:, :T], 1, 0)
    if variant in ("v7", "v8", "v9"):
        # transposed layout (H, T, W); lane dim padded to a multiple of 128
        G = 8 if variant == "v8" else 1
        R = int(offsets.shape[0])
        R_pad = -(-R // G) * G
        Wp = -(-(W + 2 * m) // 128) * 128
        mc7 = (Wp - W) // 2
        Xt7 = jnp.moveaxis(X, 0, 1)                   # (H, T, W)
        Xp7 = jnp.pad(Xt7, ((mr, mr), (0, T_pad - T), (mc7, Wp - W - mc7)))
        Hp = H + 2 * mr
        Xp7 = jnp.moveaxis(Xp7.reshape(Hp, T_pad // TB, TB, Wp), 1, 0)
        wgt = jnp.moveaxis(weights.w.reshape(H, W, -1), -1, 0)[:, :, None, :]
        wgt = jnp.pad(wgt, ((0, R_pad - R), (0, 0), (0, 0), (0, 0)))
        w07 = weights.w0.reshape(H, W)[:, None, :]
        dy = jnp.asarray(np.pad(offsets[:, 0], (0, R_pad - R)), jnp.int32)
        dx = jnp.asarray(np.pad(offsets[:, 1], (0, R_pad - R)), jnp.int32)
        kern = (_kernel_v9(R_pad, HT, W, TB, mr, mc7, Wp)
                if variant == "v9"
                else _kernel_v78(R_pad, G, HT, W, TB, mr, mc7))
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((R_pad, HT, 1, W), lambda h, t: (0, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((HT, 1, W), lambda h, t: (h, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((HT, TB, W), lambda h, t: (h, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, T_pad, W), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((HT + 2 * mr, TB, Wp), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(dy, dx, Xp7, wgt, w07)
        return jnp.moveaxis(out[:, :T], 1, 0)
    if variant in ("d1", "d2", "d3"):
        # d1: shifts without weights; d2: weights without shifts;
        # d3: neither (floor: R reads + rmw)
        use_wgt = variant == "d2"
        use_shift = variant == "d1"
        R = int(offsets.shape[0])
        wgt = jnp.moveaxis(weights.w.reshape(H, W, -1), -1, 0)
        dy = jnp.asarray(offsets[:, 0], jnp.int32)
        dx = jnp.asarray(offsets[:, 1], jnp.int32)
        out = pl.pallas_call(
            _kernel_diag(R, HT, W, TB, mr, mc, use_wgt, use_shift),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((R, HT, W), lambda h, t: (0, h, 0),
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
        )(dy, dx, Xpad, wgt, w0)
        return jnp.moveaxis(out[:, :, :T], -1, 0)
    if variant == "v6":
        G = 8
        R = int(offsets.shape[0])
        R_pad = -(-R // G) * G
        wgt = jnp.moveaxis(weights.w.reshape(H, W, -1), -1, 0)
        wgt = jnp.pad(wgt, ((0, R_pad - R), (0, 0), (0, 0)))
        dy = jnp.asarray(np.pad(offsets[:, 0], (0, R_pad - R)), jnp.int32)
        dx = jnp.asarray(np.pad(offsets[:, 1], (0, R_pad - R)), jnp.int32)
        out = pl.pallas_call(
            _kernel_v6(R_pad, G, HT, W, TB, mr, mc),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((R_pad, HT, W), lambda h, t: (0, h, 0),
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
        )(dy, dx, Xpad, wgt, w0)
    elif variant == "v5":
        wgt = jnp.moveaxis(weights.w.reshape(H, W, -1), -1, 0)
        dy = jnp.asarray(offsets[:, 0], jnp.int32)
        dx = jnp.asarray(offsets[:, 1], jnp.int32)
        out = pl.pallas_call(
            _kernel_v5(int(offsets.shape[0]), HT, W, TB, mr, mc),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((offsets.shape[0], HT, W), lambda h, t: (0, h, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((HT, W), lambda h, t: (h, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((HT, W, TB), lambda h, t: (h, 0, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W, T_pad), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((HT + 2 * mr, W + 2 * mc, TB), jnp.bfloat16),
                pltpu.SemaphoreType.DMA,
            ],
        )(dy, dx, Xpad.astype(jnp.bfloat16), wgt, w0)
    elif variant == "v4":
        wgt = jnp.moveaxis(weights.w.reshape(H, W, -1), -1, 0)
        dy = jnp.asarray(offsets[:, 0], jnp.int32)
        dx = jnp.asarray(offsets[:, 1], jnp.int32)
        out = pl.pallas_call(
            _kernel_v4(int(offsets.shape[0]), HT, W, TB, mr, mc),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((offsets.shape[0], HT, W), lambda h, t: (0, h, 0),
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
        )(dy, dx, Xpad, wgt, w0)
    elif variant == "v3":
        wgt = jnp.moveaxis(weights.w.reshape(H, W, -1), -1, 0)
        out = pl.pallas_call(
            _kernel_v3(offsets, HT, W, TB, mr, mc),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((offsets.shape[0], HT, W), lambda h, t: (0, h, 0),
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
        )(Xpad, wgt, w0)
    else:
        # group taps by dx
        order = np.lexsort((offsets[:, 0], offsets[:, 1]))
        offs_s = offsets[order]
        dx_vals, starts_, counts_ = [], [], []
        i = 0
        while i < len(offs_s):
            j = i
            while j < len(offs_s) and offs_s[j, 1] == offs_s[i, 1]:
                j += 1
            dx_vals.append(int(offs_s[i, 1]))
            starts_.append(i)
            counts_.append(j - i)
            i = j
        wgt = jnp.moveaxis(weights.w.reshape(H, W, -1), -1, 0)[order]
        out = pl.pallas_call(
            _kernel_v2(dx_vals, starts_, counts_,
                       offs_s[:, 0], HT, W, TB, mr, mc),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((offsets.shape[0], HT, W), lambda h, t: (0, h, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((HT, W), lambda h, t: (h, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((HT, W, TB), lambda h, t: (h, 0, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W, T_pad), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((HT + 2 * mr, W + 2 * mc, TB), jnp.float32),
                pltpu.VMEM((HT + 2 * mr, W, TB), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(jnp.asarray(dx_vals, jnp.int32), jnp.asarray(starts_, jnp.int32),
          jnp.asarray(counts_, jnp.int32),
          jnp.asarray(offs_s[:, 0], jnp.int32), Xpad, wgt, w0)
    return jnp.moveaxis(out[:, :, :T], -1, 0)


if __name__ == "__main__":
    import sys
    from cnmf_e_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from cnmf_e_tpu.ops.pallas_ring import apply_ring_pallas

    variant = sys.argv[1] if len(sys.argv) > 1 else "v3"
    TB = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    H = W = 256
    T = 2000
    radius = 13
    R = ring_offsets(radius).shape[0]
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((T, H, W)).astype(np.float32))
    weights = RingWeights(
        w=jnp.asarray(rng.random((H * W, R)).astype(np.float32)) / R,
        w0=jnp.asarray(rng.random((H * W,)).astype(np.float32)))

    def force(x):
        return float(jnp.sum(x))

    f_new = jax.jit(lambda ww, xx: apply_ring_variant(ww, xx, H, W, radius,
                                                      variant=variant, TB=TB))
    f_old = jax.jit(lambda ww, xx: apply_ring_pallas(ww, xx, H, W, radius))
    o_new = f_new(weights, X); force(o_new)
    o_old = f_old(weights, X); force(o_old)
    print("max diff vs current kernel:",
          float(jnp.max(jnp.abs(o_new - o_old))))
    for name, f in [(variant, f_new), ("current", f_old)]:
        t0 = time.perf_counter()
        for _ in range(3):
            force(f(weights, X))
        dt = (time.perf_counter() - t0) / 3 * 1000
        print(f"{name:8s} {dt:9.2f} ms")
