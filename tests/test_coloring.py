"""Overlap-graph coloring + the Pallas free-block fast path.

The colored update is the reference's independent-set trick
(``utilities/update_order.m:1-21``) recast for the fused TPU sweeps: rows
ordered so pairwise-independent neurons share a sweep block, which then
updates vectorized — bitwise identical to the sequential Gauss-Seidel
over the same ordering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnmf_e_tpu.ops.coloring import (block_free_flags, color_order,
                                     greedy_color, overlap_adjacency)
from cnmf_e_tpu.ops.hals import hals_spatial_sweeps
from cnmf_e_tpu.ops.pallas_hals import hals_sweeps_rows_pallas


def _compact_problem(seed=0, H=28, W=28, K=21, T=90, rad=3):
    """Footprints with genuinely compact (truncated) support so disjoint
    pairs exist — the structure the colored path exploits."""
    rng = np.random.default_rng(seed)
    d = H * W
    yy, xx = np.mgrid[0:H, 0:W]
    A = np.zeros((K, d), np.float32)
    for k in range(K):
        cy, cx = rng.uniform(3, H - 3), rng.uniform(3, W - 3)
        blob = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 6.0)
        blob[(np.abs(yy - cy) > rad) | (np.abs(xx - cx) > rad)] = 0.0
        A[k] = blob.ravel()
    C = np.abs(rng.standard_normal((K, T))).astype(np.float32)
    Y = (A.T @ C + 0.05 * rng.standard_normal((d, T))).astype(np.float32)
    Cc = C - C.mean(1, keepdims=True)
    U = (Cc @ Y.T).astype(np.float32)                  # (K, d) row-major
    V = (Cc @ Cc.T).astype(np.float32)
    return U, V, A, C


def test_greedy_color_is_proper():
    rng = np.random.default_rng(1)
    K = 40
    adj = rng.random((K, K)) < 0.15
    adj = np.triu(adj, 1)
    adj = adj | adj.T
    colors = np.asarray(greedy_color(jnp.asarray(adj)))
    ii, jj = np.nonzero(adj)
    assert np.all(colors[ii] != colors[jj]), "adjacent rows share a color"
    assert colors.max() <= adj.sum(1).max(), "exceeds max_degree + 1 bound"


def test_color_order_roundtrip():
    rng = np.random.default_rng(2)
    adj = rng.random((17, 17)) < 0.2
    adj = np.triu(adj, 1)
    adj = adj | adj.T
    order, inverse = color_order(jnp.asarray(adj))
    x = rng.standard_normal((17, 5)).astype(np.float32)
    xp = np.asarray(jnp.asarray(x)[order])
    np.testing.assert_array_equal(np.asarray(jnp.asarray(xp)[inverse]), x)
    colors = np.asarray(greedy_color(jnp.asarray(adj)))[np.asarray(order)]
    assert np.all(np.diff(colors) >= 0), "order not sorted by color"


def test_block_free_flags():
    V = np.zeros((8, 8), np.float32)
    np.fill_diagonal(V, 2.0)
    V[4, 6] = V[6, 4] = 0.5                 # couples rows in block 1
    flags = np.asarray(block_free_flags(jnp.asarray(V), block=4))
    np.testing.assert_array_equal(flags, [1, 0])
    # gated rows' couplings are ignored
    gate = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 1], jnp.float32)
    flags = np.asarray(block_free_flags(jnp.asarray(V), block=4, gate=gate))
    np.testing.assert_array_equal(flags, [1, 1])


def test_overlap_adjacency_matches_supports():
    _, _, A, _ = _compact_problem()
    adj = np.asarray(overlap_adjacency(jnp.asarray(A)))
    S = A > 0
    want = (S @ S.T) > 0
    np.fill_diagonal(want, False)
    np.testing.assert_array_equal(adj, want)
    assert not adj.all(), "compact problem must have non-overlapping pairs"


def test_flags_bitwise_spatial_masked():
    """Masked spatial sweeps: free-block vectorized updates are bitwise
    identical to the sequential inner loop (the correction dot sums exact
    zeros on disjoint masks) even though the trace Gram V is dense."""
    U, V, A, _ = _compact_problem(seed=3)
    K = A.shape[0]
    mask = jnp.asarray(A > 0)
    order, inverse = color_order(overlap_adjacency(jnp.asarray(A)))
    Up, Vp = jnp.asarray(U)[order], jnp.asarray(V)[order][:, order]
    Ap, Mp = jnp.asarray(A)[order], mask[order]
    Mf = Mp.astype(jnp.float32)
    flags = block_free_flags(Mf @ Mf.T, block=8)
    assert int(jnp.sum(flags)) > 0, "coloring produced no free blocks"
    gate = jnp.ones(K, jnp.float32)
    seq = hals_sweeps_rows_pallas(Up, Vp, Ap, gate=gate, mask=Mp,
                                  n_iter=3, block=8, relu=True,
                                  interpret=True)
    fast = hals_sweeps_rows_pallas(Up, Vp, Ap, gate=gate, mask=Mp,
                                   n_iter=3, block=8, relu=True,
                                   flags=flags, interpret=True)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(seq))
    # and the (unpermuted-order) XLA path agrees after inverse-permuting
    ref = hals_spatial_sweeps(jnp.asarray(U).T[:, order],
                              Vp, Ap.T, mask=Mp.T, n_iter=3,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref).T,
                               rtol=2e-5, atol=2e-5)


def test_flags_bitwise_temporal():
    """Temporal sweeps: disjoint footprints give exact zeros in V = A A^T,
    so flagged blocks match the sequential loop bitwise."""
    U, _, A, C = _compact_problem(seed=4)
    K, T = C.shape
    Aj = jnp.asarray(A)
    order, _ = color_order(overlap_adjacency(Aj))
    Ap = Aj[order]
    Vt = Ap @ Ap.T
    rng = np.random.default_rng(0)
    Ut = jnp.asarray(rng.standard_normal((K, T)).astype(np.float32))
    Cp = jnp.asarray(C)[order]
    flags = block_free_flags(Vt, block=8)
    assert int(jnp.sum(flags)) > 0
    gate = jnp.ones(K, jnp.float32)
    seq = hals_sweeps_rows_pallas(Ut, Vt, Cp, gate=gate, n_iter=2,
                                  block=8, relu=False, interpret=True)
    fast = hals_sweeps_rows_pallas(Ut, Vt, Cp, gate=gate, n_iter=2,
                                   block=8, relu=False, flags=flags,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(seq))


def test_colored_iteration_matches_explicit():
    """make_hals_iteration(colored=True) == explicit masked sequential
    sweeps over the same (color-sorted) ordering, un-permuted."""
    from cnmf_e_tpu.ops.hals import hals_temporal_sweeps
    from cnmf_e_tpu.ops.morphology import search_locations_dilate
    from cnmf_e_tpu.ops.ring import ring_offsets
    from cnmf_e_tpu.ops.stats import submedian_mean
    from cnmf_e_tpu.parallel.step import (StepState, make_bg_projection,
                                          make_hals_iteration)

    H = W = 32
    T, K, radius = 64, 12, 4
    R = ring_offsets(radius).shape[0]
    rng = np.random.default_rng(5)
    Y = jnp.asarray(rng.standard_normal((T, H, W)) * 0.1 + 1.0, jnp.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    A = np.zeros((K, H, W), np.float32)
    for k in range(K):
        cy, cx = rng.uniform(5, H - 5), rng.uniform(5, W - 5)
        blob = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 4.0)
        blob[blob < 1e-3] = 0.0
        A[k] = blob
    C = np.abs(rng.standard_normal((K, T))).astype(np.float32)
    st = StepState(
        A=jnp.asarray(A), C=jnp.asarray(C),
        C_raw=jnp.zeros((K, T), jnp.float32),
        S=jnp.zeros((K, T), jnp.float32),
        g=jnp.full((K,), 0.9, jnp.float32),
        b0=jnp.ones((H, W), jnp.float32),
        ring_w=jnp.full((H * W, R), 0.01, jnp.float32),
        ring_w0=jnp.zeros((H * W,), jnp.float32))

    proj = make_bg_projection(None, H, W, T, radius)
    it = make_hals_iteration(None, H, W, T, radius, n_hals=1,
                             colored=True, mask_dilate=2)
    out = it(proj(Y, st), st)

    # explicit reference: same masks, same color order, sequential sweeps
    Ysig = np.asarray(proj(Y, st).P, np.float32).reshape(T, -1)
    M = search_locations_dilate(st.A, radius=2).reshape(K, -1)
    order, inverse = color_order(overlap_adjacency(M))
    order = np.asarray(order)
    Ar = jnp.asarray(A.reshape(K, -1))[order]
    Cp = jnp.asarray(C)[order]
    Mp = M[jnp.asarray(order)]
    Cc = Cp - Cp.mean(1, keepdims=True)
    V = Cc @ Cc.T
    U = Cc @ jnp.asarray(Ysig)
    A2 = hals_spatial_sweeps(U.T, V, Ar.T, mask=Mp.T, n_iter=1,
                             use_pallas=False).T
    Vt = A2 @ A2.T
    Ut = A2 @ jnp.asarray(Ysig).T
    Craw = hals_temporal_sweeps(Ut, Vt, Cp, n_iter=1, use_pallas=False)
    Craw = Craw - submedian_mean(Craw, axis=-1)[:, None]
    inv = np.asarray(inverse)
    np.testing.assert_allclose(np.asarray(out.A).reshape(K, -1),
                               np.asarray(A2)[inv], atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.C_raw),
                               np.asarray(Craw)[inv], atol=2e-3)
