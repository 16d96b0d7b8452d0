"""Per-substage timing of one initialize_greedy round on the real TPU.

Mirrors the body of models/initialize.py::initialize_greedy round-by-round
with a StageTimer around every jitted program, to find where the ~25 s/round
goes.
"""

import sys
import time

from cnmf_e_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    H = W = 256
    T = 2000
    from cnmf_e_tpu.utils.simulate import simulate_movie
    from cnmf_e_tpu.config import CNMFEParams
    from cnmf_e_tpu.models.initialize import (
        _local_maxima_topk, _mark_searched, _peel, _place_footprints,
        _search_image, _weak_signal_test, extract_ac_batch, refilter)
    from cnmf_e_tpu.models.state import empty_state
    from cnmf_e_tpu.ops.filters import filter_movie, gaussian_psf
    from cnmf_e_tpu.ops.noise import noise_psd
    from cnmf_e_tpu.ops.oasis import deconvolve
    from cnmf_e_tpu.utils.profiling import StageTimer

    gt = simulate_movie(seed=7, H=H, W=W, T=T, K=100, gSig=3.0, sn=0.08,
                        bg_strength=0.8, min_dist=7.0, spike_rate=0.03)
    p = CNMFEParams.preset_1p()
    ip = p.init
    gSiz = int(ip.gSiz)
    psf = gaussian_psf(ip.gSig, ip.center_psf)
    tm = StageTimer()

    Y_work = jnp.asarray(gt.Y)
    for rnd_i in range(3):
        rnd = f"r{rnd_i}:"
        ref = []
        with tm.stage(rnd + "filter_movie", ref):
            HY = filter_movie(Y_work, psf)
            ref.append(HY)
        with tm.stage(rnd + "median_sub", ref):
            HY = HY - jnp.median(HY, axis=0, keepdims=True)
            ref.append(HY)
        if rnd_i == 0:
            with tm.stage(rnd + "noise_psd(HY)", ref):
                Ysig = noise_psd(jnp.moveaxis(HY, 0, -1))
                ref.append(Ysig)
        searched = jnp.zeros((H, W), bool)
        with tm.stage(rnd + "search_image", ref):
            cn, pnr, v = _search_image(HY, Ysig, searched, ip.min_corr,
                                       ip.min_pnr)
            ref.append(v)
        with tm.stage(rnd + "local_maxima", ref):
            rows, cols, valid = _local_maxima_topk(
                v, max(3, gSiz // 2) | 1, ip.seeds_per_round,
                ip.min_corr * ip.min_pnr, nms_dist=gSiz)
            ref.append(rows)
        with tm.stage(rnd + "weak_signal", ref):
            valid = valid & _weak_signal_test(HY, rows, cols)
            ref.append(valid)
        with tm.stage(rnd + "host_any", None):
            bool(jnp.any(valid))
        with tm.stage(rnd + "extract_ac", ref):
            res = extract_ac_batch(HY, Y_work, rows, cols, gSiz,
                                   min_pixel=max(ip.min_pixel, 5),
                                   corr_thr=ip.corr_pixel_thr)
            ref.append(res.a)
        with tm.stage(rnd + "deconvolve", ref):
            dres = deconvolve(res.c_raw, p.temporal.deconv, sn=res.sn)
            ref.append(dres.c)
        ok = res.ok & valid
        with tm.stage(rnd + "host_nonzero", None):
            n_ok = int(jnp.sum(ok))
            order = np.nonzero(np.asarray(ok))[0][:n_ok]
        sel = jnp.asarray(order)
        slot = jnp.arange(0, len(order))
        st = empty_state(ip.max_neurons, H, W, T)
        with tm.stage(rnd + "place_footprints", ref):
            A_new, searched = _place_footprints(
                st.A, searched, res.a[sel], rows[sel], cols[sel], slot, gSiz)
            ref.append(A_new)
        with tm.stage(rnd + "peel", ref):
            Y_work = _peel(Y_work, res.a[sel], dres.c[sel],
                           rows[sel], cols[sel], gSiz)
            ref.append(Y_work)
        with tm.stage(rnd + "mark_searched", ref):
            searched = _mark_searched(searched, rows, cols, valid)
            ref.append(searched)
        print(f"round {rnd_i} done: {len(order)} seeds", flush=True)

    print(tm.report(), flush=True)


if __name__ == "__main__":
    main()
