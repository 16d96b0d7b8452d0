import numpy as np
import jax.numpy as jnp

from cnmf_e_tpu.ops.ar import (ar2exp, ar_kernel, choose_smin,
                               estimate_time_constant, exp2ar)
from tests.oracles import ar1_trace


def test_estimate_ar1(rng):
    g_true = 0.95
    traces = np.stack([ar1_trace(rng, 5000, g=g_true, sn=0.2, rate=0.05)[0]
                       for _ in range(8)])
    g = estimate_time_constant(jnp.asarray(traces, jnp.float32), p=1)
    assert g.shape == (8, 1)
    np.testing.assert_allclose(np.asarray(g)[:, 0], g_true, atol=0.04)


def test_estimate_ar2_stable(rng):
    y, _, _ = ar1_trace(rng, 4000, g=0.9, sn=0.3, rate=0.05)
    g = estimate_time_constant(jnp.asarray(y, jnp.float32), p=2)
    g = np.asarray(g)
    # roots of z^2 - g1 z - g2 must be inside the unit disc
    roots = np.roots([1.0, -g[0], -g[1]])
    assert np.all(np.abs(roots) < 1.0)


def test_ar_kernel_shapes():
    g1 = jnp.asarray([[0.9], [0.8]])
    h = ar_kernel(g1, 100)
    assert h.shape == (2, 100)
    np.testing.assert_allclose(np.asarray(h[0, :3]), [1.0, 0.9, 0.81],
                               rtol=1e-5)

    g2 = jnp.asarray([1.6, -0.63])  # roots 0.9, 0.7
    h2 = ar_kernel(g2, 50)
    # impulse response of AR(2): h[0]=1, h[1]=g1, h[2]=g1^2+g2
    np.testing.assert_allclose(np.asarray(h2[:3]), [1.0, 1.6, 1.93],
                               rtol=1e-4)


def test_ar2exp_roundtrip():
    d, r = jnp.asarray(0.9), jnp.asarray(0.6)
    g = exp2ar(d, r)
    d2, r2 = ar2exp(g)
    np.testing.assert_allclose([float(d2), float(r2)], [0.9, 0.6], rtol=1e-5)


def test_choose_smin_scales_with_noise():
    g = jnp.asarray([[0.9]])
    s1 = float(choose_smin(g, jnp.asarray([1.0]))[0])
    s2 = float(choose_smin(g, jnp.asarray([2.0]))[0])
    np.testing.assert_allclose(s2, 2 * s1, rtol=1e-5)
    assert s1 > 0
