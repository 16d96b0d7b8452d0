"""Pipeline wall-time vs init seeds_per_round (VERDICT r4 item 5).

Runs the bench-config CNMFE.fit at several seeds_per_round values on the
real chip (2 warm runs each; the first pays compiles for the new seed
count's program shapes) and reports the async wall + neurons found.
"""

import dataclasses
import sys
import time

import numpy as np

from cnmf_e_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from cnmf_e_tpu.config import CNMFEParams  # noqa: E402
from cnmf_e_tpu.models.pipeline import CNMFE  # noqa: E402
from cnmf_e_tpu.utils.simulate import simulate_movie  # noqa: E402


def main():
    gt = simulate_movie(seed=7, H=256, W=256, T=2000, K=120, gSig=3.0,
                        sn=0.1, bg_strength=1.0, min_dist=9.0,
                        spike_rate=0.02)
    Y = jnp.asarray(gt.Y)
    base = CNMFEParams.preset_1p()
    for seeds in (int(a) for a in (sys.argv[1:] or [64, 128, 160])):
        params = base.replace(init=dataclasses.replace(
            base.init, max_neurons=192, seeds_per_round=seeds,
            max_rounds=10))
        CNMFE(params).fit(Y, verbose=False)       # compile + load
        CNMFE(params).fit(Y, verbose=False)       # steady state
        best = []
        for _ in range(2):
            t0 = time.perf_counter()
            st = CNMFE(params).fit(Y, verbose=False)
            best.append(time.perf_counter() - t0)
        n = int(np.asarray(st.active).sum())
        print(f"seeds_per_round={seeds}: wall={min(best):.2f}s "
              f"({best}), neurons={n}", flush=True)


if __name__ == "__main__":
    main()
