"""The distributed model-update step (the framework's "training step").

One full CNMF-E iteration — ring-background subtraction, spatial HALS,
temporal HALS, batched OASIS deconvolution — as a single jitted SPMD program
over the (patch, frame) mesh:

  * the ring stencil partitions over 'patch' with automatic halo exchange
  * Gram contractions (Y C^T over frames, A^T Y over pixels) psum over the
    sharded axis — the exact version of the reference's energy-weighted
    cross-patch trace reduction (``update_temporal_parallel.m:264-280``)
  * deconvolution reshards traces K-over-'patch' (per-trace parallelism,
    SURVEY.md 2.9) and runs the vmapped OASIS while_loop per shard

FLOP structure (the reference never sees this because its patches are
small; at full-FOV scale the dense contractions dominate):

  * the background-subtracted movie ``Ysig = Y - B`` is never materialized.
    The ring operator is linear, so with  P = (Y - b0) - W(Y - b0) - w0
    (one stencil pass over the movie) and  GA[k] = W(a_k)  (a stencil pass
    over the K footprint images, ~K/T the cost of a movie pass),

        Ysig = P + GA @ C

    and both HALS Grams decompose into P-contractions plus tiny K x K
    terms — this deletes the (K, d) x (K, T) reconstruction matmul that a
    literal  B = W(Y - b0 - A C)  evaluation would need.
  * with ``crop_box`` set (single-device path), the remaining P-Grams are
    evaluated only on a crop_box^2 pixel box around each footprint
    (footprints are localized — the reference's search-location semantics,
    ``determine_search_location.m``), replacing two (d, T) x (T, K)
    matmuls with gathers + batched small contractions: ~25x fewer FLOPs
    at 256x256, K~200.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cnmf_e_tpu.config import DeconvParams
from cnmf_e_tpu.ops.hals import hals_spatial_sweeps, hals_temporal_sweeps
from cnmf_e_tpu.ops.noise import noise_psd
from cnmf_e_tpu.ops.oasis import foopsi_ar1
from cnmf_e_tpu.ops.ring import RingWeights, apply_ring


class StepState(NamedTuple):
    """Arrays carried through one model-update iteration."""
    A: jnp.ndarray        # (K, H, W)
    C: jnp.ndarray        # (K, T)
    C_raw: jnp.ndarray    # (K, T)
    S: jnp.ndarray        # (K, T)
    g: jnp.ndarray        # (K,)  AR(1) coefficient per neuron
    b0: jnp.ndarray       # (H, W)
    ring_w: jnp.ndarray   # (H*W, R)
    ring_w0: jnp.ndarray  # (H*W,)


class BgProjection(NamedTuple):
    """Output of ``make_bg_projection``: the implicit-background movie
    projection plus (on the MXU path) the precomputed band tensor, both
    constant between background refreshes."""
    P: jnp.ndarray                   # (T, H, W)
    bands: Optional[jnp.ndarray]     # (H, D*W, W) bf16, or None


def _box_indices(A: jnp.ndarray, H: int, W: int, box: int):
    """Per-neuron crop_box x crop_box pixel boxes centered on the footprint
    peak, clipped fully inside the FOV. A: (K, H, W).

    Returns (idx (K, box*box) flat pixel indices, mask builder inputs
    (cy0, cx0) top-left corners (K,)).
    """
    K = A.shape[0]
    flat_arg = jnp.argmax(A.reshape(K, -1), axis=-1)
    cy = flat_arg // W
    cx = flat_arg % W
    y0 = jnp.clip(cy - box // 2, 0, H - box)
    x0 = jnp.clip(cx - box // 2, 0, W - box)
    dy = jnp.arange(box)
    yy = y0[:, None] + dy[None, :]                      # (K, box)
    xx = x0[:, None] + dy[None, :]                      # (K, box)
    idx = (yy[:, :, None] * W + xx[:, None, :]).reshape(K, box * box)
    return idx, y0, x0


def _mxu_ok(mesh, W: int, mxu: Optional[bool]) -> bool:
    """MXU banded-matmul stencil eligibility (single-device TPU, aligned W)."""
    if mxu is not None:
        return bool(mxu) and mesh is None
    return (mesh is None and W % 128 == 0
            and jax.default_backend() in ("tpu", "axon"))


def make_bg_projection(mesh: Optional[Mesh], H: int, W: int, T: int,
                       radius: int, mxu: Optional[bool] = None):
    """Build the jitted background projection
    ``proj(Y, state) -> (Pmov, bands)``.

    Pmov = (Y - b0) - W(Y - b0) - w0 is the movie passed through the
    implicit-background operator. It depends only on Y, b0 and the ring
    weights — all of which are constant BETWEEN background updates (the
    reference likewise snapshots A_prev/C_prev at the bg stage and holds
    B fixed through the following spatial/temporal updates,
    ``update_background_parallel.m:311-317``) — so a pipeline computes it
    once per background refresh and amortizes the movie-sized stencil over
    every HALS iteration in between (see ``make_hals_iteration``).

    ``bands`` is the precomputed MXU band tensor
    (ops/pallas_ring_mxu.py) for the same refresh interval, reused by the
    per-iteration GA stencil; None when the MXU path is off (mesh given,
    unaligned W, or non-TPU backend).
    """
    use_mxu = _mxu_ok(mesh, W, mxu)

    def constraint(x, spec):
        if mesh is None:
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec))

    def proj(Y: jnp.ndarray, st: StepState):
        Y = constraint(Y, P("frame", "patch", None))
        weights = RingWeights(w=st.ring_w, w0=st.ring_w0)
        Q = Y - st.b0[None]
        bands = None
        if use_mxu:
            from cnmf_e_tpu.ops.pallas_ring_mxu import (apply_ring_mxu,
                                                        ring_dense_bands)
            bands = ring_dense_bands(weights, H, W, radius)
            WQ = apply_ring_mxu(bands, st.ring_w0, Q, H, W, radius)
        elif mesh is None:
            from cnmf_e_tpu.ops.pallas_ring import ring_apply_auto
            WQ = ring_apply_auto(weights, Q, H, W, radius)   # W(Q) + w0
        else:
            WQ = apply_ring(weights, Q, H, W, radius)
        Pmov = constraint(Q - WQ, P("frame", "patch", None))  # (T, H, W)
        return BgProjection(P=Pmov, bands=bands)

    return jax.jit(proj)


def make_hals_iteration(mesh: Optional[Mesh], H: int, W: int, T: int,
                        radius: int, n_hals: int = 2,
                        deconv: Optional[DeconvParams] = None,
                        smin: float = -3.0,
                        crop_box: Optional[int] = None,
                        mxu: Optional[bool] = None,
                        chain: int = 1):
    """Build the jitted HALS iteration ``iterate(proj_out, state) -> state``
    (``proj_out`` from :func:`make_bg_projection`).

    ``chain``: run this many full iterations (HALS sweeps + baseline +
    deconvolution each) inside ONE program via ``lax.fori_loop``. Every
    dispatch through the tunneled TPU runtime costs ~29 ms regardless of
    program size, so pipelines that run a block of iterations per
    background refresh should fuse the block into a single dispatch.

    Takes the precomputed background projection ``Pmov`` and (optionally)
    the MXU band tensor from ``make_bg_projection``; only the K-footprint
    stencil GA = W(a_k) (~K/T the cost of the movie stencil) is recomputed
    per iteration. All shapes static; K must divide the 'patch' axis size
    when a mesh is given (pad K_max accordingly).

    ``crop_box``: evaluate the HALS Grams on a crop_box^2 box around each
    footprint peak and constrain footprints to it (search-location
    semantics). Single-device only — cross-shard gathers would serialize
    the SPMD program.
    """
    if crop_box is not None and mesh is not None:
        raise ValueError("crop_box is a single-device optimization")
    d = H * W

    def constraint(x, spec):
        if mesh is None:
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec))

    def one_iteration(Pmov, bands, st: StepState) -> StepState:
        Pmov = constraint(Pmov, P("frame", "patch", None))
        A = constraint(st.A, P(None, "patch", None))
        C = constraint(st.C, P(None, "frame"))
        K = A.shape[0]

        # Ysig = Y - B = Pmov + GA @ C,  GA[k] = W(a_k)
        weights = RingWeights(w=st.ring_w, w0=st.ring_w0)
        if bands is not None and mxu is not False:
            from cnmf_e_tpu.ops.pallas_ring_mxu import apply_ring_mxu
            GA = apply_ring_mxu(bands, jnp.zeros_like(st.ring_w0),
                                A, H, W, radius)             # (K, H, W)
        elif mesh is None:
            from cnmf_e_tpu.ops.pallas_ring import ring_apply_auto
            GA = ring_apply_auto(weights, A, H, W, radius,
                                 include_intercept=False)    # (K, H, W)
        else:
            GA = apply_ring(weights, A, H, W, radius,
                            include_intercept=False)         # (K, H, W)

        Pd = Pmov.reshape(T, d).T                            # (d, T)
        Ad = A.reshape(K, d).T                               # (d, K)
        GAd = GA.reshape(K, d).T                             # (d, K)

        # ---- spatial HALS ------------------------------------------------ #
        Cmean = jnp.mean(C, axis=1, keepdims=True)
        Cc = C - Cmean                                       # (K, T)
        V = Cc @ Cc.T                                        # (K, K)

        if crop_box is None:
            U = Pd @ Cc.T + GAd @ V                          # (d, K)
            mask = None
        else:
            box = crop_box
            idx, y0, x0 = _box_indices(A, H, W, box)         # (K, B)
            Pg = jnp.take(Pd, idx, axis=0)                   # (K, B, T)
            U_box = jnp.einsum("kbt,kt->kb", Pg, Cc,
                               preferred_element_type=jnp.float32)
            rows = idx.reshape(-1)
            cols = jnp.repeat(jnp.arange(K), box * box)
            U = jnp.zeros((d, K), Pd.dtype).at[rows, cols].set(
                U_box.reshape(-1))
            U = U + GAd @ V
            yy = jnp.arange(H)[:, None]
            xx = jnp.arange(W)[None, :]
            in_box = ((yy[None] >= y0[:, None, None]) &
                      (yy[None] < (y0 + box)[:, None, None]) &
                      (xx[None] >= x0[:, None, None]) &
                      (xx[None] < (x0 + box)[:, None, None]))  # (K, H, W)
            mask = in_box.reshape(K, d).T                    # (d, K)

        Ad_new = hals_spatial_sweeps(U, V, Ad, mask=mask, n_iter=n_hals)
        A_new = Ad_new.T.reshape(K, H, W)
        A_new = constraint(A_new, P(None, "patch", None))
        Ad_new = A_new.reshape(K, d).T

        # ---- temporal HALS ----------------------------------------------- #
        Vt = Ad_new.T @ Ad_new                               # (K, K)
        GtA = Ad_new.T @ GAd                                 # (K, K)
        if crop_box is None:
            Ut = Ad_new.T @ Pd + GtA @ C                     # (K, T)
        else:
            # A_new is zero outside the boxes, so the box dot is exact
            Ag = Ad_new[idx, jnp.arange(K)[:, None]]         # (K, B)
            Ut = jnp.einsum("kb,kbt->kt", Ag, Pg,
                            preferred_element_type=jnp.float32) + GtA @ C
        C_raw = hals_temporal_sweeps(Ut, Vt, C, n_iter=n_hals)

        # baseline: mean of sub-median samples (HALS_temporal.m:79)
        med = jnp.median(C_raw, axis=-1, keepdims=True)
        below = C_raw < med
        base = jnp.sum(jnp.where(below, C_raw, 0.0), axis=-1) / \
            jnp.maximum(jnp.sum(below, axis=-1), 1)
        C_raw = C_raw - base[:, None]

        # ---- deconvolution: reshard K over 'patch' --------------------- #
        C_dec_in = constraint(C_raw, P("patch", None))
        sn = noise_psd(C_dec_in)
        res = foopsi_ar1(C_dec_in, st.g, smin=smin, sn=sn, optimize_b=False)
        C_new = constraint(res.c, P(None, "frame"))
        S_new = constraint(res.s, P(None, "frame"))
        C_raw_new = constraint(C_raw, P(None, "frame"))

        return StepState(A=A_new, C=C_new, C_raw=C_raw_new, S=S_new,
                         g=st.g, b0=st.b0, ring_w=st.ring_w,
                         ring_w0=st.ring_w0)

    def iterate(Pmov, st: StepState) -> StepState:
        bands = None
        if isinstance(Pmov, (BgProjection, tuple)):
            Pmov, bands = Pmov
        if chain == 1:
            return one_iteration(Pmov, bands, st)
        return jax.lax.fori_loop(
            0, chain, lambda _, s: one_iteration(Pmov, bands, s), st)

    # NOTE: no donate_argnums — buffer donation triggers pathological
    # recompiles/serialization on the axon-tunneled TPU platform
    return jax.jit(iterate)


def make_update_step(mesh: Optional[Mesh], H: int, W: int, T: int,
                     radius: int, n_hals: int = 2,
                     deconv: Optional[DeconvParams] = None,
                     smin: float = -3.0,
                     crop_box: Optional[int] = None,
                     mxu: Optional[bool] = None):
    """Build the fused jitted update step ``step(Y, state) -> state``
    (background projection + HALS iteration in one program).

    Convenience/compat entry: pipelines that run several HALS iterations
    per background refresh should use ``make_bg_projection`` +
    ``make_hals_iteration`` instead so the movie-sized stencil is paid
    once per refresh, not once per iteration.
    """
    proj = make_bg_projection(mesh, H, W, T, radius, mxu=mxu)
    iterate = make_hals_iteration(mesh, H, W, T, radius, n_hals=n_hals,
                                  deconv=deconv, smin=smin,
                                  crop_box=crop_box, mxu=mxu)

    def step(Y: jnp.ndarray, st: StepState) -> StepState:
        return iterate(proj(Y, st), st)

    return jax.jit(step)
