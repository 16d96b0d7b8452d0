"""Low-rank background models (2p path): truncated SVD and NMF.

Reference: ``endoscope/fit_svd_model.m:27-42`` (rank-nb truncated SVD of the
background residual via ``svdsecon``) and ``fit_nmf_model.m:14-25``
(``nnmf``). TPU re-design: randomized range-finder SVD (matmuls + thin QR,
MXU-friendly) and HALS NMF with fixed iteration counts.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "n_iter", "oversample"))
def randomized_svd(X: jnp.ndarray, k: int, n_iter: int = 4,
                   oversample: int = 8, seed: int = 0
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Truncated SVD of X (m, n) via randomized subspace iteration.

    Returns (U (m,k), s (k,), Vt (k,n)).
    """
    m, n = X.shape
    p = min(k + oversample, min(m, n))
    key = jax.random.PRNGKey(seed)
    Omega = jax.random.normal(key, (n, p), dtype=X.dtype)
    Yr = X @ Omega
    Q, _ = jnp.linalg.qr(Yr)
    for _ in range(n_iter):
        Z = X.T @ Q
        Qz, _ = jnp.linalg.qr(Z)
        Yr = X @ Qz
        Q, _ = jnp.linalg.qr(Yr)
    B = Q.T @ X                                   # (p, n)
    Ub, s, Vt = jnp.linalg.svd(B, full_matrices=False)
    U = Q @ Ub
    return U[:, :k], s[:k], Vt[:k]


@functools.partial(jax.jit, static_argnames=("rank", "n_iter"))
def nmf_hals(X: jnp.ndarray, rank: int, n_iter: int = 50, seed: int = 0
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nonnegative matrix factorization X (m, n) ~= W H, W (m, r), H (r, n).

    HALS alternating updates with static iteration count (replaces MATLAB
    ``nnmf``). X is clipped at 0 (backgrounds are nonnegative here).
    """
    m, n = X.shape
    Xp = jnp.maximum(X, 0.0)
    key = jax.random.PRNGKey(seed)
    kw, kh = jax.random.split(key)
    Wf = jnp.abs(jax.random.normal(kw, (m, rank), X.dtype)) * jnp.sqrt(
        jnp.mean(Xp) / rank)
    Hf = jnp.abs(jax.random.normal(kh, (rank, n), X.dtype)) * jnp.sqrt(
        jnp.mean(Xp) / rank)

    def body(carry, _):
        Wf, Hf = carry
        # update H: row-wise HALS
        WtW = Wf.T @ Wf
        WtX = Wf.T @ Xp

        def h_col(k, H):
            num = WtX[k] - WtW[k] @ H + WtW[k, k] * H[k]
            return H.at[k].set(jnp.maximum(num / jnp.maximum(WtW[k, k], 1e-12),
                                           0.0))
        Hf = jax.lax.fori_loop(0, rank, h_col, Hf)
        # update W
        HHt = Hf @ Hf.T
        XHt = Xp @ Hf.T

        def w_col(k, Wm):
            num = XHt[:, k] - Wm @ HHt[:, k] + HHt[k, k] * Wm[:, k]
            return Wm.at[:, k].set(
                jnp.maximum(num / jnp.maximum(HHt[k, k], 1e-12), 0.0))
        Wf = jax.lax.fori_loop(0, rank, w_col, Wf)
        return (Wf, Hf), None

    (Wf, Hf), _ = jax.lax.scan(body, (Wf, Hf), None, length=n_iter)
    return Wf, Hf


def kmeans_pp(X: jnp.ndarray, k: int, seed: int = 0, n_iter: int = 10
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k-means++ clustering of rows of X (n, d) (reference:
    ``utilities/kmeans_pp.m``, used by the sparse-NMF initializer).

    Returns (centers (k, d), labels (n,)).
    """
    n, d = X.shape
    key = jax.random.PRNGKey(seed)

    def init_center(carry, key):
        centers, n_set = carry
        d2 = jnp.min(jnp.sum((X[:, None] - centers[None]) ** 2, -1)
                     + jnp.where(jnp.arange(centers.shape[0])[None]
                                 < n_set, 0.0, jnp.inf), axis=1)
        d2 = jnp.where(jnp.isfinite(d2), d2, 1.0)
        p = d2 / jnp.maximum(jnp.sum(d2), 1e-12)
        idx = jax.random.choice(key, n, p=p)
        centers = centers.at[n_set].set(X[idx])
        return (centers, n_set + 1), None

    key, k0 = jax.random.split(key)
    first = X[jax.random.randint(k0, (), 0, n)]
    centers0 = jnp.zeros((k, d), X.dtype).at[0].set(first)
    (centers, _), _ = jax.lax.scan(init_center, (centers0, jnp.int32(1)),
                                   jax.random.split(key, k - 1))

    def lloyd(carry, _):
        centers = carry
        dist = jnp.sum((X[:, None] - centers[None]) ** 2, -1)
        labels = jnp.argmin(dist, axis=1)
        one_hot = jax.nn.one_hot(labels, k, dtype=X.dtype)
        counts = jnp.sum(one_hot, axis=0)
        new_c = (one_hot.T @ X) / jnp.maximum(counts, 1.0)[:, None]
        centers = jnp.where(counts[:, None] > 0, new_c, centers)
        return centers, labels

    centers, labels = jax.lax.scan(lloyd, centers, None, length=n_iter)
    return centers, labels[-1]


def sparse_nmf_init(Y: jnp.ndarray, K: int, seed: int = 0,
                    n_iter: int = 60, l1_c: float = 0.0
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sparse-NMF initialization of (A, C) (reference:
    ``utilities/sparse_NMF_initialization.m``): cluster pixel traces with
    k-means++ to seed W, then HALS NMF with optional l1 on the traces.

    Y: (T, H, W). Returns (A (K, H, W), C (K, T)).
    """
    T, H, W = Y.shape
    Yf = jnp.maximum(Y.reshape(T, H * W).T, 0.0)   # (d, T)
    # seed: cluster a subsample of pixel traces
    d = Yf.shape[0]
    stride = max(d // 2048, 1)
    centers, _ = kmeans_pp(Yf[::stride], K, seed=seed)
    Hf = jnp.maximum(centers, 0.0)                 # (K, T) trace seeds
    Wf = jnp.maximum(Yf @ Hf.T, 0.0) / jnp.maximum(
        jnp.sum(Hf * Hf, -1)[None], 1e-12)

    def body(carry, _):
        Wf, Hf = carry
        HHt = Hf @ Hf.T
        XHt = Yf @ Hf.T

        def w_col(k, Wm):
            num = XHt[:, k] - Wm @ HHt[:, k] + HHt[k, k] * Wm[:, k]
            return Wm.at[:, k].set(
                jnp.maximum(num / jnp.maximum(HHt[k, k], 1e-12), 0.0))
        Wf = jax.lax.fori_loop(0, K, w_col, Wf)
        WtW = Wf.T @ Wf
        WtX = Wf.T @ Yf

        def h_col(k, Hm):
            num = WtX[k] - WtW[k] @ Hm + WtW[k, k] * Hm[k] - l1_c
            return Hm.at[k].set(
                jnp.maximum(num / jnp.maximum(WtW[k, k], 1e-12), 0.0))
        Hf = jax.lax.fori_loop(0, K, h_col, Hf)
        return (Wf, Hf), None

    (Wf, Hf), _ = jax.lax.scan(body, (Wf, Hf), None, length=n_iter)
    return Wf.T.reshape(K, H, W), Hf


def fit_lowrank_model(Y: jnp.ndarray, A: jnp.ndarray, C: jnp.ndarray,
                      rank: int, mode: str = "svd"
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fit B = b f (+ b0) to the residual Y - A C.

    Y: (T, H, W); A: (K, H, W); C: (K, T).
    Returns (b (rank, H, W), f (rank, T), b0 (H, W)).
    Reference: ``fit_svd_model.m:27-42`` — residual is mean-centered per
    pixel (the mean becomes b0) before the rank-nb factorization.
    """
    T, H, W = Y.shape
    resid = Y - jnp.einsum("khw,kt->thw", A, C)
    b0 = jnp.mean(resid, axis=0)
    Xc = (resid - b0[None]).reshape(T, H * W).T     # (d, T)
    if mode == "svd":
        U, s, Vt = randomized_svd(Xc, rank)
        b = (U * s[None]).T.reshape(rank, H, W)
        f = Vt
    elif mode == "nmf":
        Wf, Hf = nmf_hals(Xc, rank)
        b = Wf.T.reshape(rank, H, W)
        f = Hf
    else:
        raise ValueError(f"unknown low-rank mode {mode!r}")
    return b, f, b0
