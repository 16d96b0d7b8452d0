import numpy as np
import jax.numpy as jnp

from cnmf_e_tpu.config import CNMFEParams, InitParams
from cnmf_e_tpu.models.initialize import extract_ac_batch, initialize_greedy
from cnmf_e_tpu.utils.simulate import simulate_movie
from cnmf_e_tpu.utils.metrics import detection_f1, trace_corr


def test_extract_ac_recovers_single_neuron(rng):
    """One synthetic neuron in a quiet box: footprint and trace recovered."""
    T, H, W = 400, 31, 31
    gSiz = 8
    yy, xx = np.mgrid[0:H, 0:W]
    a_true = np.exp(-((yy - 15) ** 2 + (xx - 15) ** 2) / (2 * 2.5**2))
    a_true[a_true < np.exp(-2)] = 0
    c_true = np.zeros(T)
    spk = rng.random(T) < 0.03
    for t in range(T):
        c_true[t] = (c_true[t - 1] * 0.9 if t else 0) + (1.5 if spk[t] else 0)
    Y = (a_true[None] * c_true[:, None, None]
         + 1.0 + 0.05 * rng.standard_normal((T, H, W))).astype(np.float32)
    HY = Y - Y.mean(axis=0, keepdims=True)

    res = extract_ac_batch(jnp.asarray(HY), jnp.asarray(Y),
                           jnp.asarray([15]), jnp.asarray([15]), gSiz)
    assert bool(res.ok[0])
    a_est = np.asarray(res.a[0])
    # footprint center block must correlate strongly with the truth
    a_true_box = a_true[15 - gSiz:15 + gSiz + 1, 15 - gSiz:15 + gSiz + 1]
    cc = np.corrcoef(a_est.ravel(), a_true_box.ravel())[0, 1]
    assert cc > 0.9, cc
    tc = np.corrcoef(np.asarray(res.c_raw[0]), c_true)[0, 1]
    assert tc > 0.95, tc


def test_initialize_greedy_finds_neurons():
    gt = simulate_movie(seed=7, H=64, W=64, T=500, K=10, gSig=2.5,
                        sn=0.08, bg_strength=0.6, min_dist=12.0,
                        spike_rate=0.04)
    params = CNMFEParams(
        init=InitParams(gSig=2.5, gSiz=8, min_corr=0.8, min_pnr=8.0,
                        max_neurons=40, seeds_per_round=16, max_rounds=6))
    state, info = initialize_greedy(jnp.asarray(gt.Y), params, verbose=True)
    n = int(state.n_active())
    assert n >= 8, f"found only {n} of 10"

    A_est = np.asarray(state.masked_A())[:n]
    f1 = detection_f1(A_est, gt.A)
    assert f1["recall"] >= 0.8, f1
    assert f1["precision"] >= 0.7, f1
    corrs = trace_corr(np.asarray(state.C_raw), gt.C, f1["matches"])
    assert np.median(corrs) > 0.9, corrs


def test_initialize_with_downsampling():
    gt = simulate_movie(seed=9, H=64, W=64, T=400, K=8, gSig=3.0,
                        sn=0.06, bg_strength=0.5, min_dist=14.0,
                        spike_rate=0.05)
    params = CNMFEParams(
        init=InitParams(gSig=3.0, gSiz=10, min_corr=0.75, min_pnr=7.0,
                        max_neurons=32, seeds_per_round=16, max_rounds=5,
                        ssub=2, tsub=2))
    state, info = initialize_greedy(jnp.asarray(gt.Y), params)
    n = int(state.n_active())
    assert n >= 6, n
    assert state.A.shape[1:] == (64, 64)
    assert state.C.shape[-1] == 400
    f1 = detection_f1(np.asarray(state.masked_A())[:n], gt.A)
    assert f1["recall"] >= 0.7, f1
