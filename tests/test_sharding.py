"""Shard-count invariance: the distributed step must produce the same
numbers on 1 device and on a (4, 2) virtual mesh (SURVEY.md section 4 —
the analog of the reference's parfor/serial equivalence guarantee)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cnmf_e_tpu.ops.ring import RingWeights, fit_ring_weights, ring_offsets
from cnmf_e_tpu.parallel.mesh import make_mesh
from cnmf_e_tpu.parallel.step import StepState, make_update_step


def _mkstate(K, H, W, T, R, rng):
    return StepState(
        A=jnp.asarray(np.abs(rng.standard_normal((K, H, W))), jnp.float32),
        C=jnp.asarray(np.abs(rng.standard_normal((K, T))), jnp.float32),
        C_raw=jnp.zeros((K, T), jnp.float32),
        S=jnp.zeros((K, T), jnp.float32),
        g=jnp.full((K,), 0.9, jnp.float32),
        b0=jnp.zeros((H, W), jnp.float32),
        ring_w=jnp.full((H * W, R), 0.01, jnp.float32),
        ring_w0=jnp.zeros((H * W,), jnp.float32),
    )


def test_step_shard_count_invariance(rng):
    H, W, T, K, radius = 32, 16, 128, 8, 3
    R = ring_offsets(radius).shape[0]
    Y = jnp.asarray(rng.standard_normal((T, H, W)) * 0.1 + 1.0, jnp.float32)
    st = _mkstate(K, H, W, T, R, rng)

    step1 = make_update_step(None, H, W, T, radius=radius, n_hals=1)
    out1 = step1(Y, st)

    mesh = make_mesh(n_patch=4, n_frame=2)
    stepN = make_update_step(mesh, H, W, T, radius=radius, n_hals=1)
    put = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
    Ys = put(Y, P("frame", "patch", None))
    sts = StepState(
        A=put(st.A, P(None, "patch", None)), C=put(st.C, P(None, "frame")),
        C_raw=put(st.C_raw, P(None, "frame")), S=put(st.S, P(None, "frame")),
        g=put(st.g, P()), b0=put(st.b0, P("patch", None)),
        ring_w=put(st.ring_w, P("patch", None)),
        ring_w0=put(st.ring_w0, P("patch")))
    outN = stepN(Ys, sts)

    np.testing.assert_allclose(np.asarray(out1.A), np.asarray(outN.A),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out1.C), np.asarray(outN.C),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out1.S), np.asarray(outN.S),
                               atol=2e-3)


def test_ring_fit_compiles_under_mesh(rng):
    """The gather-heavy ring fit must at least compile+run on a sharded
    input (XLA may insert gathers/all-gathers; exactness is what matters)."""
    H = W = 32
    T = 64
    radius = 4
    Bf = jnp.asarray(rng.standard_normal((T, H, W)), jnp.float32)
    ref = fit_ring_weights(Bf, H, W, radius)

    mesh = make_mesh(n_patch=4, n_frame=2)
    Bfs = jax.device_put(Bf, NamedSharding(mesh, P("frame", "patch", None)))
    out = fit_ring_weights(Bfs, H, W, radius)
    np.testing.assert_allclose(np.asarray(out.w), np.asarray(ref.w),
                               atol=1e-3)
