"""Fused Pallas HALS sweeps (interpret mode) vs the XLA blocked path and
the float64 Gauss-Seidel oracle (HALS_spatial.m:26-46 semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cnmf_e_tpu.ops.hals import hals_spatial_sweeps, hals_temporal_sweeps
from cnmf_e_tpu.ops.pallas_hals import hals_sweeps_rows_pallas


def _problem(seed=0, d=400, K=24, T=150):
    rng = np.random.default_rng(seed)
    A = np.maximum(rng.standard_normal((d, K)), 0).astype(np.float32)
    C = np.abs(rng.standard_normal((K, T))).astype(np.float32)
    Y = (A @ C + 0.1 * rng.standard_normal((d, T))).astype(np.float32)
    Cc = C - C.mean(1, keepdims=True)
    U = (Y @ Cc.T).astype(np.float32)
    V = (Cc @ Cc.T).astype(np.float32)
    return U, V, A, C, Y


def _gs_oracle(U, V, A, n_iter, relu=True, mask=None, gate=None):
    """Float64 plain (unblocked) Gauss-Seidel — the fixed-point semantics
    both implementations must track."""
    U = U.astype(np.float64)
    V = V.astype(np.float64)
    A = A.astype(np.float64).copy()
    cc = np.diag(V)
    K = A.shape[1]
    for _ in range(n_iter):
        for k in range(K):
            if gate is not None and not gate[k]:
                continue
            if cc[k] <= 0:
                continue
            r = U[:, k] - A @ V[:, k]
            ak = A[:, k] + r / max(cc[k], 1e-12)
            if relu:
                ak = np.maximum(ak, 0.0)
            if mask is not None:
                ak = np.where(mask[:, k], ak, 0.0)
            A[:, k] = ak
    return A


def test_pallas_spatial_matches_xla_and_oracle():
    U, V, A, _, _ = _problem()
    ref_xla = np.asarray(hals_spatial_sweeps(
        jnp.asarray(U), jnp.asarray(V), jnp.asarray(A), n_iter=3))
    got = np.asarray(hals_sweeps_rows_pallas(
        jnp.asarray(U.T), jnp.asarray(V), jnp.asarray(A.T),
        gate=jnp.ones(V.shape[0]), n_iter=3, relu=True,
        interpret=True)).T
    np.testing.assert_allclose(got, ref_xla, rtol=2e-5, atol=2e-5)
    oracle = _gs_oracle(U, V, A, n_iter=3)
    np.testing.assert_allclose(got, oracle, rtol=5e-4, atol=5e-4)


def test_pallas_spatial_with_mask():
    U, V, A, _, _ = _problem(seed=1)
    rng = np.random.default_rng(5)
    mask = rng.random(A.shape) > 0.3
    ref_xla = np.asarray(hals_spatial_sweeps(
        jnp.asarray(U), jnp.asarray(V), jnp.asarray(A),
        mask=jnp.asarray(mask), n_iter=2))
    got = np.asarray(hals_sweeps_rows_pallas(
        jnp.asarray(U.T), jnp.asarray(V), jnp.asarray(A.T),
        gate=jnp.ones(V.shape[0]), mask=jnp.asarray(mask.T),
        n_iter=2, relu=True, interpret=True)).T
    np.testing.assert_allclose(got, ref_xla, rtol=2e-5, atol=2e-5)


def test_pallas_temporal_matches_xla():
    rng = np.random.default_rng(2)
    d, K, T = 300, 20, 170
    A = np.maximum(rng.standard_normal((d, K)), 0).astype(np.float32)
    Y = rng.standard_normal((d, T)).astype(np.float32)
    C0 = np.abs(rng.standard_normal((K, T))).astype(np.float32)
    U = (A.T @ Y).astype(np.float32)
    V = (A.T @ A).astype(np.float32)
    active = rng.random(K) > 0.2
    ref = np.asarray(hals_temporal_sweeps(
        jnp.asarray(U), jnp.asarray(V), jnp.asarray(C0),
        n_iter=3, active=jnp.asarray(active)))
    got = np.asarray(hals_sweeps_rows_pallas(
        jnp.asarray(U), jnp.asarray(V), jnp.asarray(C0),
        gate=jnp.asarray(active), n_iter=3, relu=False, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_pallas_ragged_padding():
    """K not a multiple of the block and d not a multiple of the lane
    tile both pad transparently."""
    U, V, A, _, _ = _problem(seed=3, d=333, K=19)
    ref_xla = np.asarray(hals_spatial_sweeps(
        jnp.asarray(U), jnp.asarray(V), jnp.asarray(A), n_iter=2))
    got = np.asarray(hals_sweeps_rows_pallas(
        jnp.asarray(U.T), jnp.asarray(V), jnp.asarray(A.T),
        gate=jnp.ones(19), n_iter=2, relu=True, interpret=True)).T
    np.testing.assert_allclose(got, ref_xla, rtol=2e-5, atol=2e-5)


def test_pallas_rss_descent():
    """Each sweep decreases ||Ysig - A C||^2 (the HALS objective)."""
    U, V, A, C, Y = _problem(seed=4)
    Cc = C - C.mean(1, keepdims=True)
    Yc = Y - Y.mean(1, keepdims=True)
    prev = np.inf
    for n in (1, 2, 4):
        out = np.asarray(hals_sweeps_rows_pallas(
            jnp.asarray(U.T), jnp.asarray(V), jnp.asarray(A.T),
            gate=jnp.ones(V.shape[0]), n_iter=n, relu=True,
            interpret=True)).T
        rss = float(np.sum((Yc - out @ Cc) ** 2))
        assert rss <= prev + 1e-3
        prev = rss
