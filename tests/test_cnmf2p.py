import numpy as np
import jax.numpy as jnp
import pytest

from cnmf_e_tpu.models.cnmf2p import (CNMF, find_unsaturated_pixels,
                                      greedy_roi, interp_missing_data,
                                      lasso_noise_constrained,
                                      preprocess_data)
from cnmf_e_tpu.utils.metrics import detection_f1, trace_corr
from cnmf_e_tpu.utils.simulate import simulate_movie


def test_interp_missing_data(rng):
    Y = jnp.asarray(rng.standard_normal((20, 4, 4)), jnp.float32)
    Yn = Y.at[5:8, 1, 1].set(jnp.nan).at[0, 2, 2].set(jnp.nan)
    out = np.asarray(interp_missing_data(Yn))
    assert np.isfinite(out).all()
    # untouched samples unchanged
    np.testing.assert_allclose(out[:, 0, 0], np.asarray(Y[:, 0, 0]))
    # interior gap filled between neighbors
    lo = min(float(Y[4, 1, 1]), float(Y[8, 1, 1]))
    hi = max(float(Y[4, 1, 1]), float(Y[8, 1, 1]))
    assert lo - 1e-5 <= out[6, 1, 1] <= hi + 1e-5


def test_find_unsaturated(rng):
    Y = np.abs(rng.standard_normal((100, 8, 8))).astype(np.float32)
    Y[:, 3, 3] = 10.0  # pinned pixel
    mask = np.asarray(find_unsaturated_pixels(jnp.asarray(Y)))
    assert not mask[3, 3]
    assert mask.sum() == 63


def test_greedy_roi_finds_blobs(rng):
    gt = simulate_movie(seed=41, H=48, W=48, T=300, K=6, gSig=3.0,
                        sn=0.05, bg_strength=0.0, min_dist=14.0,
                        spike_rate=0.05)
    A, C, centers = greedy_roi(jnp.asarray(gt.Y), K=6, gSig=3.0)
    assert A.shape[0] >= 5
    f1 = detection_f1(np.asarray(A), gt.A)
    assert f1["recall"] >= 0.8, f1


def test_lasso_noise_constrained_sparsity(rng):
    K, T, d = 6, 400, 50
    C = np.abs(rng.standard_normal((K, T))).astype(np.float32)
    a_true = np.zeros((d, K), np.float32)
    a_true[np.arange(d), rng.integers(0, K, d)] = 1.0  # one neuron per pixel
    sn = 0.1
    Y = a_true @ C + sn * rng.standard_normal((d, T)).astype(np.float32)
    a = lasso_noise_constrained(jnp.asarray(C), jnp.asarray(Y),
                                jnp.full((d,), sn), None)
    a = np.asarray(a)
    # recovered coefficients concentrate on the true support
    frac_on_true = (a * (a_true > 0)).sum() / max(a.sum(), 1e-9)
    assert frac_on_true > 0.9, frac_on_true
    np.testing.assert_allclose(a.max(axis=1), 1.0, atol=0.15)


@pytest.mark.slow
def test_cnmf2p_pipeline(rng):
    gt = simulate_movie(seed=43, H=48, W=48, T=400, K=6, gSig=3.0,
                        sn=0.06, bg_strength=0.4, min_dist=14.0,
                        spike_rate=0.05)
    model = CNMF(K=10, gSig=3.0, nb=2)
    state = model.fit(gt.Y, n_outer=2, verbose=True)
    n = int(state.n_active())
    A_est = np.asarray(state.masked_A())[:n]
    f1 = detection_f1(A_est, gt.A)
    assert f1["recall"] >= 0.8, f1
    corrs = trace_corr(np.asarray(state.C)[:n], gt.C, f1["matches"])
    assert np.median(corrs) > 0.85, corrs
