import numpy as np
import jax.numpy as jnp
import pytest

from cnmf_e_tpu.config import (BackgroundParams, CNMFEParams, InitParams,
                               MergeParams)
from cnmf_e_tpu.io.store import distribute_movie
from cnmf_e_tpu.models.streaming import fit_streaming
from cnmf_e_tpu.utils.metrics import detection_f1, trace_corr
from cnmf_e_tpu.utils.simulate import simulate_movie


@pytest.mark.slow
def test_streaming_pipeline(tmp_path):
    gt = simulate_movie(seed=61, H=48, W=48, T=800, K=7, gSig=2.5,
                        sn=0.08, bg_strength=0.7, min_dist=12.0,
                        spike_rate=0.04)
    src = str(tmp_path / "m.npy")
    np.save(src, gt.Y)
    store = distribute_movie(src, str(tmp_path / "store"),
                             frames_per_block=200)

    params = CNMFEParams(
        init=InitParams(gSig=2.5, gSiz=8, min_corr=0.8, min_pnr=8.0,
                        max_neurons=32, seeds_per_round=16, max_rounds=5),
        background=BackgroundParams(model="ring", ring_radius=9),
        merge=MergeParams(dmin=4.0),
    )
    state = fit_streaming(store, params, n_outer=2,
                          init_budget_frames=400, verbose=True)
    n = int(state.n_active())
    assert state.C.shape[-1] == 800
    A_est = np.asarray(state.masked_A())[:n]
    f1 = detection_f1(A_est, gt.A)
    assert f1["recall"] >= 0.7, f1
    corrs = trace_corr(np.asarray(state.C)[:n], gt.C, f1["matches"])
    assert np.median(corrs) > 0.85, corrs
