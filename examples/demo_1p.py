"""1-photon demo pipeline (the reference's ``demo_large_data_1p.m`` role).

Runs the full CNMF-E pipeline on a synthetic micro-endoscopic movie with
known ground truth, reports detection/trace metrics, and writes the result
bundle + figures. Swap ``simulate_movie`` for ``load_movie(path)`` to run
on real data (or use the CLI: ``python -m cnmf_e_tpu.run movie.tif``).
"""

import numpy as np

from cnmf_e_tpu.config import (BackgroundParams, CNMFEParams, InitParams,
                               MergeParams)
from cnmf_e_tpu.io.export import save_results
from cnmf_e_tpu.models.pipeline import CNMFE
from cnmf_e_tpu.utils.metrics import detection_f1, trace_corr
from cnmf_e_tpu.utils.simulate import simulate_movie
from cnmf_e_tpu.utils.viz import plot_summary, save_neuron_panels


def main():
    gt = simulate_movie(seed=0, H=128, W=128, T=1000, K=25, gSig=3.0,
                        sn=0.08, bg_strength=0.8, min_dist=10.0,
                        spike_rate=0.03)

    params = CNMFEParams(
        fs=10.0,
        init=InitParams(gSig=3.0, gSiz=10, min_corr=0.8, min_pnr=8.0,
                        max_neurons=64, seeds_per_round=32, max_rounds=8),
        background=BackgroundParams(model="ring", ring_radius=14),
        merge=MergeParams(dmin=5.0),
    )
    model = CNMFE(params)
    state = model.fit(gt.Y, n_outer=2, verbose=True)

    n = int(state.n_active())
    A = np.asarray(state.masked_A())[:n]
    C = np.asarray(state.C)[:n]
    f1 = detection_f1(A, gt.A)
    corrs = trace_corr(C, gt.C, f1["matches"])
    print(f"neurons: {n}  F1={f1['f1']:.3f}  "
          f"precision={f1['precision']:.3f} recall={f1['recall']:.3f}  "
          f"median trace corr={np.median(corrs):.3f}")

    save_results("demo_1p_results", state, params=params)
    plot_summary("demo_1p_summary.png", np.asarray(model.info["Cn"]), A, C)
    save_neuron_panels("demo_1p_neurons", A, C,
                       C_raw=np.asarray(state.C_raw)[:n],
                       S=np.asarray(state.S)[:n], fs=params.fs)
    print("wrote demo_1p_results.npz, demo_1p_summary.png, demo_1p_neurons/")


if __name__ == "__main__":
    main()
