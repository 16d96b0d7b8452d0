"""HALS block-coordinate updates for the spatial (A) and temporal (C) factors.

Reference: ``utilities/HALS_spatial.m:26-46`` and ``utilities/HALS_temporal.m:58-107``.
The per-neuron rank-1 updates are kept exactly (Gauss-Seidel over K neurons,
a ``lax.fori_loop``); the Gram precomputations U = Y C^T, V = C C^T are the
FLOP-heavy part and run as large MXU matmuls. Under a (patch, frame) mesh the
Grams are computed on local shards and reduced with ``psum`` along the frame
axis — the exact version of the reference's energy-weighted patch averaging
(``update_temporal_parallel.m:264-280``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def hals_spatial_sweeps(U: jnp.ndarray, V: jnp.ndarray, A: jnp.ndarray,
                        mask: Optional[jnp.ndarray] = None,
                        n_iter: int = 5) -> jnp.ndarray:
    """Gauss-Seidel spatial sweeps given precomputed Grams.

    U = Ysig @ Cc^T (d, K), V = Cc @ Cc^T (K, K). Callers that can express
    Ysig implicitly (e.g. the ring-background step, where
    Ysig = P + (W A) C) build U/V without materializing Ysig.
    """
    cc = jnp.diag(V)
    if mask is not None:
        A = jnp.where(mask, A, 0.0)

    def neuron_update(k, A):
        ak = A[:, k] + (U[:, k] - A @ V[:, k]) / jnp.maximum(cc[k], 1e-12)
        ak = jnp.maximum(ak, 0.0)
        if mask is not None:
            ak = jnp.where(mask[:, k], ak, 0.0)
        ak = jnp.where(cc[k] > 0, ak, A[:, k])
        return A.at[:, k].set(ak)

    def sweep(_, A):
        return jax.lax.fori_loop(0, A.shape[1], neuron_update, A)

    return jax.lax.fori_loop(0, n_iter, sweep, A)


@functools.partial(jax.jit, static_argnames=("n_iter",))
def hals_spatial(Y: jnp.ndarray, A: jnp.ndarray, C: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 n_iter: int = 5) -> jnp.ndarray:
    """Update A given C:  A <- max(0, A + (U - A V) / diag(V)) per neuron.

    Y: (d, T) background-subtracted data; A: (d, K); C: (K, T);
    mask: (d, K) search-location mask (True = allowed support).
    Means are removed from Y and C first (HALS_spatial.m:28-32).
    """
    T = Y.shape[-1]
    Ymean = jnp.mean(Y, axis=1, keepdims=True)
    Cmean = jnp.mean(C, axis=1, keepdims=True)
    U = (Y @ C.T - T * (Ymean @ Cmean.T)).astype(A.dtype)   # (d, K)
    V = (C @ C.T - T * (Cmean @ Cmean.T)).astype(A.dtype)   # (K, K)
    return hals_spatial_sweeps(U, V, A, mask=mask, n_iter=n_iter)


def hals_temporal_sweeps(U: jnp.ndarray, V: jnp.ndarray, C: jnp.ndarray,
                         n_iter: int = 5,
                         active: Optional[jnp.ndarray] = None
                         ) -> jnp.ndarray:
    """Gauss-Seidel temporal sweeps given precomputed Grams.

    U = A^T Ysig (K, T), V = A^T A (K, K); U stays fixed across sweeps
    (it is built from the pre-update C, like ``HALS_temporal.m:58-107``).
    """
    aa = jnp.diag(V)

    def neuron_update(k, C):
        ck = C[k] + (U[k] - V[k] @ C) / jnp.maximum(aa[k], 1e-12)
        ck = jnp.where(aa[k] > 0, ck, C[k])
        if active is not None:
            ck = jnp.where(active[k], ck, C[k])
        return C.at[k].set(ck)

    def sweep(_, C):
        return jax.lax.fori_loop(0, C.shape[0], neuron_update, C)

    return jax.lax.fori_loop(0, n_iter, sweep, C)


@functools.partial(jax.jit, static_argnames=("n_iter",))
def hals_temporal(Y: jnp.ndarray, A: jnp.ndarray, C: jnp.ndarray,
                  n_iter: int = 5,
                  active: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Update C given A:  c_k <- c_k + (U_k - V_k C) / aa_k (no deconvolution).

    Y: (d, T); A: (d, K); C: (K, T). Returns (C_raw, aa) where aa = ||a_k||^2
    (the cross-patch reduction weights of the reference). Deconvolution /
    baseline handling is applied by the caller on C_raw
    (HALS_temporal.m:58-107 folds it per neuron; we batch it over neurons).
    """
    U = (A.T @ Y).astype(C.dtype)          # (K, T)
    V = (A.T @ A).astype(C.dtype)          # (K, K)
    C = hals_temporal_sweeps(U, V, C, n_iter=n_iter, active=active)
    return C, jnp.diag(V)


def hals_nmf(Y: jnp.ndarray, A: jnp.ndarray, C: jnp.ndarray,
             n_iter: int = 10,
             mask: Optional[jnp.ndarray] = None
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Alternate spatial/temporal HALS (used for rank-1 merge refits and the
    simple init refinement, reference: ``merge_neurons_dist_corr.m:180-187``)."""
    for _ in range(n_iter):
        A = hals_spatial(Y, A, C, mask=mask, n_iter=1)
        C, _ = hals_temporal(Y, A, C, n_iter=1)
        C = jnp.maximum(C, 0.0)
    return A, C
