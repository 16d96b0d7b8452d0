import numpy as np
import jax.numpy as jnp

from cnmf_e_tpu.ops.noise import (estimate_baseline_noise, estimate_noise,
                                  noise_psd, noise_std)


def test_noise_psd_white_noise(rng):
    sn_true = 0.7
    y = sn_true * rng.standard_normal((16, 3000)).astype(np.float32)
    sn = noise_psd(jnp.asarray(y))
    assert sn.shape == (16,)
    np.testing.assert_allclose(np.asarray(sn), sn_true, rtol=0.12)


def test_noise_psd_ignores_slow_signal(rng):
    # a large slow oscillation must not inflate the high-band noise estimate
    t = np.arange(4000)
    sig = 5.0 * np.sin(2 * np.pi * t / 500.0)
    y = (sig + 0.5 * rng.standard_normal(4000)).astype(np.float32)
    sn = float(noise_psd(jnp.asarray(y)))
    assert abs(sn - 0.5) < 0.12


def test_noise_std(rng):
    y = 1.5 * rng.standard_normal((4, 2000)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(noise_std(jnp.asarray(y))), 1.5,
                               rtol=0.1)


def test_baseline_noise_histogram(rng):
    # baseline 2.0 + sparse positive transients; histogram fit should find
    # the baseline mode, not the mean
    T = 5000
    y = 2.0 + 0.4 * rng.standard_normal(T)
    events = rng.random(T) < 0.02
    y = y + np.where(events, 4.0 * rng.random(T), 0.0)
    b, sn = estimate_baseline_noise(jnp.asarray(y, jnp.float32))
    assert abs(float(b) - 2.0) < 0.25
    assert abs(float(sn) - 0.4) < 0.15


def test_estimate_noise_dispatch(rng):
    y = jnp.asarray(rng.standard_normal((3, 1000)), jnp.float32)
    for method in ("psd", "hist", "std"):
        sn = estimate_noise(y, method)
        assert sn.shape == (3,)
        assert np.all(np.isfinite(np.asarray(sn)))


def test_noise_psd_frames_matches_noise_psd(rng):
    """The band-restricted DFT-matmul form (noise_psd_frames, the movie
    path) must equal the rfft Welch form exactly."""
    from cnmf_e_tpu.ops.noise import noise_psd, noise_psd_frames
    for T, shape in [(2000, (7, 9)), (500, (64,)), (300, (4, 5))]:
        Y = jnp.asarray(rng.standard_normal((T,) + shape)
                        .astype(np.float32) * 0.3 + 1.0)
        a = np.asarray(noise_psd(jnp.moveaxis(Y, 0, -1)))
        b = np.asarray(noise_psd_frames(Y))
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-6)
