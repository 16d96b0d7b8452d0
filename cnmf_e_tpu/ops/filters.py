"""Spatial filtering kernels (gaussian / center-surround PSF).

Reference: ``greedyROI_endoscope.m:104-127`` builds a gaussian PSF
(``fspecial('gaussian', ceil(gSig*4+1), gSig)``); with ``center_psf`` the
PSF is restricted to its central disc and mean-subtracted over that disc
(an annulus-subtracted matched filter that cancels the locally-constant 1p
background). Filtering uses replicate (edge) padding.

Movies are laid out ``(T, H, W)`` — frames are the conv batch dimension, so
XLA maps the stencil onto the MXU/VPU and, under a sharded-in-H layout,
SPMD partitioning inserts the halo exchange automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_psf(gSig: float, center_psf: bool = True,
                 size: int | None = None) -> np.ndarray:
    """Build the (possibly center-surround) PSF as a host-side numpy array."""
    if gSig <= 0:
        return np.ones((1, 1), np.float32)
    if size is None:
        size = int(np.ceil(gSig * 4 + 1))
    half = (size - 1) / 2.0
    y, x = np.mgrid[-half:half + 1, -half:half + 1][:, :size, :size]
    psf = np.exp(-(x**2 + y**2) / (2.0 * gSig**2))
    psf /= psf.sum()
    if center_psf:
        # central disc = pixels whose value >= the max of the first column
        ind = psf >= psf[:, 0].max()
        psf = psf - psf[ind].mean()
        psf[~ind] = 0.0
    return psf.astype(np.float32)


def _separable_factors(psf: np.ndarray, rel_tol: float = 1e-5):
    """SVD decomposition of the PSF into separable rank-1 terms
    sum_r u_r v_r^T, truncated at ``rel_tol`` of the leading singular
    value. Gaussian PSFs are rank 1; the center-surround (disc-masked)
    PSF is rank ~3-4."""
    U, S, Vt = np.linalg.svd(psf.astype(np.float64))
    keep = S >= rel_tol * S[0]
    r = max(int(keep.sum()), 1)
    us = (U[:, :r] * S[:r]).astype(np.float32)      # (kh, r)
    vs = Vt[:r].T.astype(np.float32)                # (kw, r)
    return us, vs


def _band_matrix(taps: np.ndarray, N: int) -> np.ndarray:
    """(N, N) matrix B with out[i] = sum_o taps[o] * x[clip(i + o - c, 0,
    N-1)] = (B @ x)[i] — a banded correlation matrix with replicate-edge
    semantics folded into the boundary rows."""
    k = taps.shape[0]
    c = k // 2
    B = np.zeros((N, N), np.float32)
    for o in range(k):
        idx = np.clip(np.arange(N) + o - c, 0, N - 1)
        B[np.arange(N), idx] += taps[o]
    return B


_filter_cache: dict = {}


def _filter_movie_mxu(Y: jnp.ndarray, psf: np.ndarray) -> jnp.ndarray:
    """Separable-SVD stencil as banded MXU matmuls.

    A (T, H, W) single-channel conv maps terribly onto the TPU conv units
    (no channel contraction for the MXU to chew on — measured ~3 GFLOP/s);
    the same stencil as sum_r Bh_r @ Y @ Bw_r^T of banded (H, H) / (W, W)
    matrices runs as rank-r * 2 dense matmuls at full MXU rate. Replicate
    padding lives in the band matrices' boundary rows; exact to the SVD
    truncation (rel 1e-5 of sigma_1).
    """
    T, H, W = Y.shape
    key = (psf.tobytes(), psf.shape, H, W)
    if key not in _filter_cache:
        # conv-path semantics: CONVOLUTION with psf == correlation with the
        # flipped psf (only visible for asymmetric kernels)
        us, vs = _separable_factors(psf[::-1, ::-1])
        Bh = np.stack([_band_matrix(us[:, r], H) for r in range(us.shape[1])])
        Bw = np.stack([_band_matrix(vs[:, r], W) for r in range(vs.shape[1])])
        # cache NUMPY, not device arrays: a jnp.asarray created while
        # tracing a jitted caller is a tracer, and caching it leaks it
        # into later traces (UnexpectedTracerError)
        _filter_cache[key] = (Bh, Bw)
    Bh, Bw = (jnp.asarray(a) for a in _filter_cache[key])
    rank = Bh.shape[0]
    out = None
    for r in range(rank):
        Zh = jnp.einsum("hi,tiw->thw", Bh[r], Y,
                        preferred_element_type=jnp.float32)
        Zr = jnp.einsum("thw,jw->thj", Zh, Bw[r],
                        preferred_element_type=jnp.float32)
        out = Zr if out is None else out + Zr
    return out


def filter_movie(Y: jnp.ndarray, psf: np.ndarray) -> jnp.ndarray:
    """2-D filter each frame of ``Y (T, H, W)`` with replicate padding.

    On TPU the stencil is evaluated as separable banded matmuls
    (:func:`_filter_movie_mxu`); elsewhere as a conv (the conv path is the
    oracle the tests compare against)."""
    if psf.shape == (1, 1):
        return Y * float(psf[0, 0])
    if jax.default_backend() in ("tpu", "axon"):
        return _filter_movie_mxu(Y, psf)
    kh, kw = psf.shape
    ph, pw = kh // 2, kw // 2
    Yp = jnp.pad(Y, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw)),
                 mode="edge")
    lhs = Yp[:, None, :, :]                         # NCHW, C=1
    rhs = jnp.asarray(psf[::-1, ::-1].copy())[None, None]  # OIHW (correlation)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    return out[:, 0]


def neighbor_kernel(dmin: float = 1.0, dmax: float = 2.0) -> np.ndarray:
    """Ring-of-neighbors indicator kernel (reference:
    ``correlation_image.m:57-70``): pixels at distance in [dmin, dmax)."""
    r = int(np.ceil(dmax)) - 1
    y, x = np.mgrid[-r:r + 1, -r:r + 1]
    R = np.sqrt(x**2 + y**2)
    return ((R >= dmin) & (R < dmax)).astype(np.float32)


def box_downsample(Y: jnp.ndarray, ssub: int = 1, tsub: int = 1) -> jnp.ndarray:
    """Spatio-temporal box down-sampling of a (T, H, W) movie (reference:
    ``dsData.m:33-43``); trailing remainders are averaged into the last bin."""
    T, H, W = Y.shape
    if ssub > 1:
        Hs, Ws = -(-H // ssub), -(-W // ssub)
        pad_h, pad_w = Hs * ssub - H, Ws * ssub - W
        Yp = jnp.pad(Y, ((0, 0), (0, pad_h), (0, pad_w)), mode="edge")
        Y = Yp.reshape(T, Hs, ssub, Ws, ssub).mean(axis=(2, 4))
    if tsub > 1:
        Ts = T // tsub
        Y = Y[: Ts * tsub].reshape(Ts, tsub, *Y.shape[1:]).mean(axis=1)
    return Y


def spatial_upsample(A: jnp.ndarray, ssub: int, out_hw) -> jnp.ndarray:
    """Nearest/bilinear upsample of footprints (K, Hs, Ws) -> (K, H, W)."""
    if ssub == 1:
        return A
    K = A.shape[0]
    return jax.image.resize(A, (K, out_hw[0], out_hw[1]), method="linear")
