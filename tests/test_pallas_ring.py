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
