"""Morphological ops and shape priors, batched over neurons on device.

Reference components:
  * ``circular_constraints.m:30-41`` — zero pixels whose intensity gradient
    points away from the peak (and are < peak/3), then keep the peak's
    4-connected component.
  * ``connectivity_constraint.m:12-21`` — morphological open, threshold,
    keep the component containing the peak.
  * ``determine_search_location.m`` ('dilate' method) — grow footprints by a
    disc structuring element.

Connected components on a 2-D grid run as iterative max-label propagation
(a fixed-point stencil, fine for footprint-sized images and SPMD-friendly);
the host-side C++ union-find in :mod:`cnmf_e_tpu.native` serves the graph
clustering use-case (merge candidates) instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def disc_kernel(radius: int) -> np.ndarray:
    y, x = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    return ((x**2 + y**2) <= radius**2).astype(np.float32)


def _maxpool(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Masked max-filter of (..., H, W) by a structuring element."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    neg = jnp.finfo(x.dtype).min
    if np.all(kernel > 0):
        return jax.lax.reduce_window(
            x, neg, jax.lax.max, (1,) * (x.ndim - 2) + (kh, kw),
            (1,) * x.ndim, [(0, 0)] * (x.ndim - 2) + [(ph, kh - 1 - ph),
                                                      (pw, kw - 1 - pw)])
    # non-rectangular SE: max over shifted copies where kernel is set
    outs = []
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(ph, kh - 1 - ph),
                                               (pw, kw - 1 - pw)],
                 constant_values=neg)
    for dy in range(kh):
        for dx in range(kw):
            if kernel[dy, dx]:
                outs.append(jax.lax.dynamic_slice(
                    xp, (0,) * (x.ndim - 2) + (dy, dx), x.shape))
    return functools.reduce(jnp.maximum, outs)


def dilate(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Binary dilation of (..., H, W) by a disc (search-location growth)."""
    k = disc_kernel(radius)
    return _maxpool(mask.astype(jnp.float32), k) > 0.5


def erode(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    k = disc_kernel(radius)
    return ~(_maxpool((~mask).astype(jnp.float32), k) > 0.5)


def opening(img: jnp.ndarray, size: int = 5) -> jnp.ndarray:
    """Grayscale opening with a square SE (erode then dilate)."""
    k = np.ones((size, size), np.float32)
    eroded = -_maxpool(-img, k)
    return _maxpool(eroded, k)


@functools.partial(jax.jit, static_argnames=("n_iter", "connectivity"))
def label_from_seed(mask: jnp.ndarray, seed_row: jnp.ndarray,
                    seed_col: jnp.ndarray, n_iter: int = 0,
                    connectivity: int = 4) -> jnp.ndarray:
    """Flood-fill: the connected component of ``mask`` (..., H, W) containing
    (seed_row, seed_col), via iterative neighbor-max propagation."""
    H, W = mask.shape[-2:]
    if n_iter == 0:
        n_iter = H + W
    seed = (jax.nn.one_hot(seed_row, H, dtype=jnp.float32)[..., :, None]
            * jax.nn.one_hot(seed_col, W, dtype=jnp.float32)[..., None, :])
    if connectivity == 4:
        k = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], np.float32)
    else:
        k = np.ones((3, 3), np.float32)
    m = mask.astype(jnp.float32)
    reach = seed * m

    def body(_, reach):
        return jnp.minimum(_maxpool(reach, k), m)

    reach = jax.lax.fori_loop(0, n_iter, body, reach)
    return reach > 0.5


def connectivity_constraint(img: jnp.ndarray, thr: float = 0.01,
                            se_size: int = 5) -> jnp.ndarray:
    """Keep only the peak-connected blob of a footprint (..., H, W).

    Reference: ``connectivity_constraint.m`` — open, threshold at
    thr * max, keep the 4-connected component containing the peak.
    """
    H, W = img.shape[-2:]
    opened = opening(img, se_size)
    peak = jnp.max(img, axis=(-2, -1), keepdims=True)
    core = opened > jnp.maximum(peak * thr, 1e-12)
    flat_arg = jnp.argmax(img.reshape(img.shape[:-2] + (-1,)), axis=-1)
    pr, pc = flat_arg // W, flat_arg % W
    keep = label_from_seed(core, pr, pc)
    return jnp.where(keep, img, 0.0)


def circular_constraint(img: jnp.ndarray) -> jnp.ndarray:
    """Zero pixels whose gradient points away from the peak (and are dim),
    then keep the peak's connected component (``circular_constraints.m``)."""
    H, W = img.shape[-2:]
    flat_arg = jnp.argmax(img.reshape(img.shape[:-2] + (-1,)), axis=-1)
    pr, pc = (flat_arg // W).astype(jnp.float32), (flat_arg % W).astype(jnp.float32)
    vmax = jnp.max(img, axis=(-2, -1), keepdims=True)

    fy, fx = jnp.gradient(img, axis=(-2, -1))
    yy = jnp.arange(H, dtype=img.dtype)[:, None]
    xx = jnp.arange(W, dtype=img.dtype)[None, :]
    dy = pr[..., None, None] - yy
    dx = pc[..., None, None] - xx
    bad = ((fx * dx + fy * dy) < 0) & (img < vmax / 3.0)
    out = jnp.where(bad, 0.0, img)

    keep = label_from_seed(out > 0, (flat_arg // W), (flat_arg % W))
    keep = dilate(keep, 1)
    return jnp.where(keep, out, 0.0)


def search_locations_dilate(A: jnp.ndarray, radius: int = 4,
                            thr: float = 0.0) -> jnp.ndarray:
    """'dilate' search masks: grow each footprint's support by a disc
    (reference: ``determine_search_location.m`` 'dilate' branch)."""
    peak = jnp.max(A, axis=(-2, -1), keepdims=True)
    support = A > jnp.maximum(thr * peak, 0.0)
    return dilate(support, radius)


def search_locations_ellipse(A: jnp.ndarray, dist: float = 3.0,
                             min_size: float = 3.0, max_size: float = 8.0
                             ) -> jnp.ndarray:
    """'ellipse' search masks (``determine_search_location.m`` default):
    per neuron, an ellipse centered at the center of mass with axes along
    the footprint's principal components, scaled by ``dist`` and clamped to
    [min_size, max_size]. A: (K, H, W) -> bool (K, H, W)."""
    K, H, W = A.shape
    yy = jnp.arange(H, dtype=A.dtype)[:, None]
    xx = jnp.arange(W, dtype=A.dtype)[None, :]
    mass = jnp.sum(A, axis=(1, 2)) + 1e-12
    cy = jnp.sum(A * yy[None], axis=(1, 2)) / mass
    cx = jnp.sum(A * xx[None], axis=(1, 2)) / mass
    dy = yy[None] - cy[:, None, None]
    dx = xx[None] - cx[:, None, None]
    # weighted covariance of pixel coordinates
    syy = jnp.sum(A * dy * dy, axis=(1, 2)) / mass
    sxx = jnp.sum(A * dx * dx, axis=(1, 2)) / mass
    sxy = jnp.sum(A * dx * dy, axis=(1, 2)) / mass
    cov = jnp.stack([jnp.stack([syy, sxy], -1),
                     jnp.stack([sxy, sxx], -1)], -2)   # (K, 2, 2)
    evals, evecs = jnp.linalg.eigh(cov)
    axes = jnp.clip(jnp.sqrt(jnp.maximum(evals, 1e-6)) * dist,
                    min_size, max_size)                # (K, 2)
    # mask: || diag(1/axes) R^T (p - c) || <= 1
    py = evecs[..., 0, 0][:, None, None] * dy + \
        evecs[..., 1, 0][:, None, None] * dx
    px = evecs[..., 0, 1][:, None, None] * dy + \
        evecs[..., 1, 1][:, None, None] * dx
    r2 = (py / axes[:, 0, None, None]) ** 2 + \
        (px / axes[:, 1, None, None]) ** 2
    return r2 <= 1.0


def threshold_components(A: jnp.ndarray, energy_frac: float = 0.99
                         ) -> jnp.ndarray:
    """Keep each footprint's smallest pixel set holding ``energy_frac`` of
    its energy (reference: ``threshold_components.m``)."""
    K = A.shape[0]
    flat = A.reshape(K, -1)
    order = jnp.sort(flat * flat, axis=-1)[:, ::-1]
    csum = jnp.cumsum(order, axis=-1)
    total = csum[:, -1:]
    # threshold value: energy of the last pixel kept
    n_keep = jnp.sum(csum < energy_frac * total, axis=-1) + 1
    thr2 = jnp.take_along_axis(order, jnp.minimum(
        n_keep[:, None] - 1, order.shape[1] - 1), axis=-1)
    keep = flat * flat >= thr2
    return (flat * keep).reshape(A.shape)
