import numpy as np
import jax.numpy as jnp

from cnmf_e_tpu.ops.pallas_ring import apply_ring_pallas
from cnmf_e_tpu.ops.ring import RingWeights, apply_ring, ring_offsets


def test_pallas_ring_matches_xla_interpret(rng):
    """The Pallas stencil kernel (interpret mode on CPU) must reproduce the
    XLA weighted-shift formulation exactly."""
    H = W = 128
    T = 8
    radius = 5
    R = ring_offsets(radius).shape[0]
    X = jnp.asarray(rng.standard_normal((T, H, W)), jnp.float32)
    w = RingWeights(
        w=jnp.asarray(rng.standard_normal((H * W, R)).astype(np.float32) * 0.1),
        w0=jnp.asarray(rng.standard_normal(H * W).astype(np.float32)))
    ref = apply_ring(w, X, H, W, radius)
    out = apply_ring_pallas(w, X, H, W, radius, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_mxu_ring_matches_xla_interpret(rng):
    """The banded-matmul (MXU) formulation must reproduce the XLA form up
    to bf16 tap precision (taps/bands bf16, accumulation f32)."""
    from cnmf_e_tpu.ops.pallas_ring_mxu import ring_dense_bands, apply_ring_mxu
    H, W, T, radius = 16, 32, 24, 4
    R = ring_offsets(radius).shape[0]
    X = jnp.asarray(rng.standard_normal((T, H, W)), jnp.float32)
    w = RingWeights(
        w=jnp.asarray(rng.standard_normal((H * W, R)).astype(np.float32)
                      * 0.1 + 0.05),
        w0=jnp.asarray(rng.standard_normal(H * W).astype(np.float32)))
    bands = ring_dense_bands(w, H, W, radius)
    ref = apply_ring(w, X, H, W, radius)
    out = apply_ring_mxu(bands, w.w0, X, H, W, radius, interpret=True)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out) / scale,
                               np.asarray(ref) / scale, atol=2e-2)
    # intercept-free variant (the GA footprint stencil path)
    ref0 = apply_ring(w, X, H, W, radius, include_intercept=False)
    out0 = apply_ring_mxu(bands, jnp.zeros_like(w.w0), X, H, W, radius,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out0) / scale,
                               np.asarray(ref0) / scale, atol=2e-2)


def test_mxu_ring_flat_matches_xla_interpret(rng):
    """apply_ring_mxu_flat (the production TPU movie-pass kernel used by
    make_bg_projection) must match the XLA form up to bf16 tap precision —
    interpret-mode equivalence so the suite catches regressions (ADVICE r2)."""
    from cnmf_e_tpu.ops.pallas_ring_mxu import (ring_dense_bands,
                                                apply_ring_mxu_flat)
    H, W, T, radius = 16, 128, 24, 4
    R = ring_offsets(radius).shape[0]
    X = jnp.asarray(rng.standard_normal((T, H, W)), jnp.float32)
    w = RingWeights(
        w=jnp.asarray(rng.standard_normal((H * W, R)).astype(np.float32)
                      * 0.1 + 0.05),
        w0=jnp.asarray(rng.standard_normal(H * W).astype(np.float32)))
    bands = ring_dense_bands(w, H, W, radius)
    ref = apply_ring(w, X, H, W, radius)
    out = apply_ring_mxu_flat(bands, w.w0, X, H, W, radius, interpret=True)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out) / scale,
                               np.asarray(ref) / scale, atol=2e-2)
