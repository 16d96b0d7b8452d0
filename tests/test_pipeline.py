import numpy as np
import jax.numpy as jnp
import pytest

from cnmf_e_tpu.config import (BackgroundParams, CNMFEParams, InitParams,
                               MergeParams)
from cnmf_e_tpu.models.pipeline import CNMFE
from cnmf_e_tpu.utils.metrics import detection_f1, rss, trace_corr
from cnmf_e_tpu.utils.simulate import simulate_movie


def _params_1p():
    return CNMFEParams(
        init=InitParams(gSig=2.5, gSiz=8, min_corr=0.8, min_pnr=8.0,
                        max_neurons=40, seeds_per_round=16, max_rounds=6),
        background=BackgroundParams(model="ring", ring_radius=9),
        merge=MergeParams(dmin=4.0),
    )


@pytest.mark.slow
def test_full_pipeline_1p_recovers_ground_truth():
    gt = simulate_movie(seed=11, H=64, W=64, T=600, K=10, gSig=2.5,
                        sn=0.08, bg_strength=0.8, min_dist=12.0,
                        spike_rate=0.04)
    model = CNMFE(_params_1p())
    state = model.fit(gt.Y, n_outer=2, verbose=True)

    n = int(state.n_active())
    A_est = np.asarray(state.masked_A())[:n]
    C_est = np.asarray(state.C)[:n]
    f1 = detection_f1(A_est, gt.A)
    assert f1["recall"] >= 0.8, f1
    assert f1["precision"] >= 0.6, f1
    corrs = trace_corr(C_est, gt.C, f1["matches"])
    assert np.median(corrs) > 0.9, corrs

    # reconstruction explains most variance
    B = np.asarray(model.background(gt.Y))
    r = rss(gt.Y, A_est, C_est, B)
    total = float(np.sum((gt.Y - gt.Y.mean(axis=0, keepdims=True)) ** 2))
    assert r < 0.35 * total, (r, total)

    # DF/F runs and is finite
    C_df, C_raw_df, F0 = model.dff(gt.Y)
    assert np.all(np.isfinite(np.asarray(C_df)))


@pytest.mark.slow
def test_full_pipeline_2p_svd_background():
    gt = simulate_movie(seed=13, H=48, W=48, T=500, K=8, gSig=2.5,
                        sn=0.06, bg_strength=0.5, min_dist=11.0,
                        spike_rate=0.04)
    params = CNMFEParams(
        init=InitParams(gSig=2.5, gSiz=8, min_corr=0.8, min_pnr=8.0,
                        max_neurons=30, seeds_per_round=16, max_rounds=5),
        background=BackgroundParams(model="svd", rank=3),
        merge=MergeParams(dmin=4.0),
    )
    model = CNMFE(params)
    state = model.fit(gt.Y, n_outer=1, verbose=True)
    n = int(state.n_active())
    f1 = detection_f1(np.asarray(state.masked_A())[:n], gt.A)
    assert f1["recall"] >= 0.75, f1


@pytest.mark.slow
def test_bg_refresh_every_fidelity_mode():
    """``BackgroundParams.refresh_every=1`` restores the reference's
    per-outer-iteration background refresh cadence
    (``demo_large_data_1p.m:199-201``). The refreshed-B fit must not fit
    the data worse than the amortized schedule (RSS non-increase within
    run-to-run tolerance)."""
    import dataclasses

    gt = simulate_movie(seed=19, H=64, W=64, T=600, K=10, gSig=2.5,
                        sn=0.08, bg_strength=0.9, min_dist=12.0,
                        spike_rate=0.04)
    base = _params_1p()

    def final_rss(params):
        model = CNMFE(params)
        state = model.fit(gt.Y, n_outer=3)
        n = int(state.n_active())
        B = np.asarray(model.background(gt.Y))
        return rss(gt.Y, np.asarray(state.masked_A())[:n],
                   np.asarray(state.C)[:n], B), n

    r_amort, n_amort = final_rss(base)
    r_fresh, n_fresh = final_rss(base.replace(
        background=dataclasses.replace(base.background, refresh_every=1)))
    assert n_fresh >= 1 and n_amort >= 1
    # per-iteration refreshes must not degrade the fit
    assert r_fresh <= 1.05 * r_amort, (r_fresh, r_amort)
