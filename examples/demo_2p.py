"""2-photon demos: vanilla CNMF (demo_script.m role) and the CNMF-E
pipeline with an SVD background (demo_large_data_2p.m role)."""

import numpy as np

from cnmf_e_tpu.config import BackgroundParams, CNMFEParams, InitParams
from cnmf_e_tpu.models.cnmf2p import CNMF
from cnmf_e_tpu.models.pipeline import CNMFE
from cnmf_e_tpu.utils.metrics import detection_f1
from cnmf_e_tpu.utils.simulate import simulate_movie


def main():
    gt = simulate_movie(seed=1, H=96, W=96, T=800, K=20, gSig=4.0,
                        sn=0.06, bg_strength=0.4, min_dist=12.0,
                        spike_rate=0.04)

    print("--- vanilla CNMF (greedyROI + noise-constrained lasso) ---")
    model = CNMF(K=30, gSig=4.0, nb=2)
    state = model.fit(gt.Y, n_outer=2, verbose=True)
    n = int(state.n_active())
    f1 = detection_f1(np.asarray(state.masked_A())[:n], gt.A)
    print(f"vanilla: {n} components, F1={f1['f1']:.3f}")

    print("--- CNMF-E pipeline with rank-3 SVD background ---")
    params = CNMFEParams(
        init=InitParams(gSig=4.0, gSiz=12, min_corr=0.8, min_pnr=8.0,
                        center_psf=False, max_neurons=48),
        background=BackgroundParams(model="svd", rank=3))
    state2 = CNMFE(params).fit(gt.Y, n_outer=2, verbose=True)
    n2 = int(state2.n_active())
    f12 = detection_f1(np.asarray(state2.masked_A())[:n2], gt.A)
    print(f"cnmfe-svd: {n2} components, F1={f12['f1']:.3f}")

    print("--- BASELINE config 4: AR(2) constrained OASIS sweep ---")
    # demo_large_data_2p.m with the constrained_oasisAR2.m deconvolution
    # family: lambda tuned per trace until RSS = sn^2 T
    import dataclasses
    p4 = CNMFEParams.preset_2p("ar2_constrained")
    p4 = p4.replace(init=dataclasses.replace(
        p4.init, gSig=4.0, gSiz=12, center_psf=False, max_neurons=48))
    state3 = CNMFE(p4).fit(gt.Y, n_outer=2, verbose=True)
    n3 = int(state3.n_active())
    f13 = detection_f1(np.asarray(state3.masked_A())[:n3], gt.A)
    T = gt.Y.shape[0]
    C_raw = np.asarray(state3.C_raw)[:n3]
    C = np.asarray(state3.C)[:n3]
    sn = np.asarray(state3.neuron_sn)[:n3]
    ratio = np.sum((C_raw - C) ** 2, axis=-1) / np.maximum(sn**2 * T,
                                                           1e-12)
    print(f"cnmfe-ar2: {n3} components, F1={f13['f1']:.3f}, "
          f"median RSS/budget={np.median(ratio):.2f} "
          f"(g columns: {state3.g.shape[1]})")


if __name__ == "__main__":
    main()
