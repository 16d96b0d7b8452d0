"""Batched nonnegative least squares.

The reference solves many small NNLS problems serially per pixel
(``ca_source_extraction/endoscope/nnls_spatial.m:34-60``, Bro & de Jong
active-set). On TPU we solve *all* problems simultaneously with accelerated
projected gradient (FISTA) on the normal equations — fixed iteration count,
static shapes, runs on the MXU via batched matmuls. For well-conditioned
small Grams (K <= a few hundred) 50-100 iterations reach active-set-level
accuracy; monotonicity is guaranteed by the projection.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def nnls_fista(G: jnp.ndarray, b: jnp.ndarray, x0: Optional[jnp.ndarray] = None,
               n_iter: int = 100) -> jnp.ndarray:
    """Solve min_x 1/2 x^T G x - b^T x  s.t. x >= 0, batched.

    G: (..., K, K) PSD Gram matrices; b: (..., K). Returns x: (..., K).
    Uses FISTA with step 1/L, L = a cheap upper bound on ||G||_2
    (max row-sum norm), computed per batch element.
    """
    G = jnp.asarray(G)
    b = jnp.asarray(b)
    K = G.shape[-1]
    L = jnp.maximum(jnp.max(jnp.sum(jnp.abs(G), axis=-1), axis=-1), 1e-12)
    step = (1.0 / L)[..., None]
    default = jnp.maximum(b * step, 0.0)
    if x0 is None:
        x = default
    else:
        # an all-zero warm start (e.g. the first window of a warm-started
        # scan) is strictly worse than the gradient-step default — fall
        # back per batch element
        x = jnp.where(jnp.any(x0 > 0, axis=-1, keepdims=True),
                      jnp.maximum(x0, 0.0), default)
    z = x
    t = jnp.ones(G.shape[:-2], G.dtype)

    def body(carry, _):
        x, z, t = carry
        grad = jnp.einsum("...ij,...j->...i", G, z) - b
        x_new = jnp.maximum(z - step * grad, 0.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        z = x_new + ((t - 1.0) / t_new)[..., None] * (x_new - x)
        return (x_new, z, t_new), None

    (x, _, _), _ = jax.lax.scan(body, (x, z, t), None, length=n_iter)
    return x


def nnls_pixels(C: jnp.ndarray, Y: jnp.ndarray, A0: Optional[jnp.ndarray] = None,
                mask: Optional[jnp.ndarray] = None, n_iter: int = 100) -> jnp.ndarray:
    """Per-pixel NNLS for the spatial update: A = argmin ||Y - A C||_F^2, A>=0.

    C: (K, T), Y: (d, T); optional search-location mask (d, K) restricts the
    support. One shared Gram G = C C^T serves every pixel (the reference
    recomputes per-pixel active sets; here masking handles the support).
    """
    G = C @ C.T                        # (K, K)
    B = Y @ C.T                        # (d, K)
    if mask is not None:
        # masked coordinates are frozen at zero by zeroing their gradient flow
        B = jnp.where(mask, B, 0.0)
    L = jnp.maximum(jnp.max(jnp.sum(jnp.abs(G), axis=-1)), 1e-12)
    step = 1.0 / L
    x = jnp.maximum(B * step, 0.0) if A0 is None else jnp.maximum(A0, 0.0)
    if mask is not None:
        x = jnp.where(mask, x, 0.0)
    z = x
    t = jnp.asarray(1.0, Y.dtype)

    def body(carry, _):
        x, z, t = carry
        grad = z @ G - B
        x_new = jnp.maximum(z - step * grad, 0.0)
        if mask is not None:
            x_new = jnp.where(mask, x_new, 0.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        z = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return (x_new, z, t_new), None

    (x, _, _), _ = jax.lax.scan(body, (x, z, t), None, length=n_iter)
    return x
