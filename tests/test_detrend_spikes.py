import numpy as np
import jax.numpy as jnp

from cnmf_e_tpu.ops.detrend import (bspline_basis, detrend, detrend_local_min,
                                    detrend_spline)
from cnmf_e_tpu.ops.spikes import decorr_temporal, event_detection


def test_bspline_basis_partition_of_unity():
    B = bspline_basis(200, 6)
    assert B.shape[0] == 200
    np.testing.assert_allclose(B.sum(axis=1), 1.0, atol=1e-5)


def test_detrend_spline_removes_slow_drift(rng):
    t = np.arange(1000)
    drift = 2.0 * np.sin(t / 400.0) + 0.003 * t
    y = drift + 0.1 * rng.standard_normal((4, 1000))
    out, trend = detrend_spline(jnp.asarray(y, jnp.float32), n_knots=8)
    out = np.asarray(out)
    assert np.abs(out.mean(axis=1)).max() < 0.05
    assert out.std() < 0.2  # drift gone, noise remains


def test_detrend_local_min(rng):
    y = np.abs(rng.standard_normal((3, 100))) + 5.0
    out, _ = detrend_local_min(jnp.asarray(y, jnp.float32), n_blocks=5)
    out = np.asarray(out)
    assert out.min() >= 0
    assert out.max() < y.max()


def test_detrend_noop():
    y = jnp.ones((2, 50))
    np.testing.assert_array_equal(np.asarray(detrend(y, n_knots=1)), 1.0)


def test_event_detection(rng):
    C = np.zeros((2, 200), np.float32)
    C[0, 50] = 5.0
    C[0, 51] = 4.0   # decay, not a separate event
    C[1, 100] = 0.2  # below threshold
    E = np.asarray(event_detection(jnp.asarray(C),
                                   jnp.asarray([0.5, 0.5]), sig=5.0,
                                   window=8))
    assert E[0, 50] == 5.0
    assert E[0, 51] == 0.0
    assert E[1].max() == 0.0


def test_decorr_temporal_suppresses_crosstalk():
    H = W = 20
    A = np.zeros((2, H, W), np.float32)
    A[0, 5:8, 5:8] = 1.0
    A[1, 7:10, 7:10] = 1.0   # neighbor within gSiz
    S = np.zeros((2, 100), np.float32)
    S[0, 40] = 2.0
    S[1, 40] = 0.5            # spurious crosstalk copy of neuron 0's spike
    S[1, 70] = 1.5            # genuine own spike
    C = np.zeros_like(S)
    g = np.full((2, 1), 0.9, np.float32)
    sn = np.array([0.1, 0.1], np.float32)
    C2 = np.asarray(decorr_temporal(jnp.asarray(C), jnp.asarray(S),
                                    jnp.asarray(A), jnp.asarray(g),
                                    jnp.asarray(sn), gSiz=8.0))
    assert C2[1, 40] == 0.0       # crosstalk spike removed
    assert C2[1, 70] > 1.0        # genuine spike kept
    assert C2[0, 40] > 1.5        # dominant neuron keeps its spike
