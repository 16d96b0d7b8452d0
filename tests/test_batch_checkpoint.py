import os

import numpy as np
import jax.numpy as jnp
import pytest

from cnmf_e_tpu.checkpoint import RunLog, find_latest_run, restore_state
from cnmf_e_tpu.config import (BackgroundParams, CNMFEParams, InitParams,
                               MergeParams)
from cnmf_e_tpu.models.batch import fit_batches
from cnmf_e_tpu.utils.metrics import detection_f1, trace_corr
from cnmf_e_tpu.utils.simulate import simulate_movie


def _params():
    return CNMFEParams(
        init=InitParams(gSig=2.5, gSiz=8, min_corr=0.8, min_pnr=8.0,
                        max_neurons=32, seeds_per_round=16, max_rounds=5),
        background=BackgroundParams(model="ring", ring_radius=9),
        merge=MergeParams(dmin=4.0),
    )


@pytest.mark.slow
def test_batch_mode_concatenates_and_matches_truth(tmp_path):
    gt = simulate_movie(seed=21, H=48, W=48, T=900, K=7, gSig=2.5,
                        sn=0.08, bg_strength=0.7, min_dist=12.0,
                        spike_rate=0.04)
    batches = [gt.Y[:300], gt.Y[300:600], gt.Y[600:]]
    final, per_batch = fit_batches(batches, _params(), verbose=True)
    assert final.C.shape[-1] == 900
    n = int(per_batch[0].n_active())
    A_est = np.asarray(final.masked_A())[:n]
    f1 = detection_f1(A_est, gt.A)
    assert f1["recall"] >= 0.7, f1
    corrs = trace_corr(np.asarray(final.C)[:n], gt.C, f1["matches"])
    assert np.median(corrs) > 0.85, corrs


def test_runlog_snapshot_and_restore(tmp_path):
    from cnmf_e_tpu.models.state import empty_state
    params = _params()
    log = RunLog(str(tmp_path), params=params)
    st = empty_state(16, 24, 24, 100)
    st = st.replace(active=st.active.at[:2].set(True),
                    A=st.A.at[:2, 5:9, 5:9].set(1.0),
                    C=st.C.at[:2].set(3.0))
    log.log("hello")
    p = log.snapshot("init", st)
    assert os.path.exists(p)
    assert log.latest_snapshot() == p

    st2 = restore_state(p, K_max=16, H=24, W=24, T=100)
    assert int(st2.n_active()) == 2
    np.testing.assert_allclose(np.asarray(st2.C[0]), 3.0)

    assert find_latest_run(str(tmp_path)) == log.dir
    with open(log.log_path) as f:
        content = f.read()
    assert "hello" in content and "snapshot" in content


@pytest.mark.slow
def test_pipeline_resume_from_snapshot(tmp_path):
    from cnmf_e_tpu.models.pipeline import CNMFE
    gt = simulate_movie(seed=71, H=48, W=48, T=400, K=6, gSig=2.5,
                        sn=0.08, bg_strength=0.6, min_dist=12.0,
                        spike_rate=0.04)
    params = _params()
    log = RunLog(str(tmp_path), params=params)
    model = CNMFE(params)
    state1 = model.fit(gt.Y, n_outer=1, run_log=log)
    snap = log.latest_snapshot()
    assert snap is not None

    # resume skips init and lands on a similar solution
    model2 = CNMFE(params)
    state2 = model2.fit(gt.Y, n_outer=1, resume_from=snap)
    n1, n2 = int(state1.n_active()), int(state2.n_active())
    assert abs(n1 - n2) <= 2, (n1, n2)
