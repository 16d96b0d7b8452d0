"""AOT-precompile the bench / probe update-step programs into the
persistent cache (chipless helper — safe to run concurrently with a
transfer-bound streaming run).

Covers bench.py's variant set plus the probe_sched_block.py /
chain_drift.py grids so the post-run perf window pays zero Mosaic
compile time.

  PYTHONPATH=/root/repo python scripts_dev/precompile_bench.py
"""

import time

from cnmf_e_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cnmf_e_tpu.ops.ring import ring_offsets  # noqa: E402
from cnmf_e_tpu.parallel.step import StepState, make_update_step  # noqa


def main():
    H = W = 256
    T = 2000
    K = 192
    radius = 13
    n_iter = 10
    R = ring_offsets(radius).shape[0]
    f32 = jnp.float32
    S = jax.ShapeDtypeStruct
    Y = S((T, H, W), f32)
    st = StepState(
        A=S((K, H, W), f32), C=S((K, T), f32), C_raw=S((K, T), f32),
        S=S((K, T), f32), g=S((K,), f32), b0=S((H, W), f32),
        ring_w=S((H * W, R), f32), ring_w0=S((H * W,), f32))

    jobs = [
        ("deconv_every_1", dict(chain=n_iter)),
        ("deconv_every_5", dict(chain=n_iter, deconv_every=5)),
        ("deconv_every_10", dict(chain=n_iter, deconv_every=n_iter)),
    ]
    for cb in (16, 32, 64, 128):
        for dots in ("highest", "hi_lo", "fast"):
            jobs.append((f"colored_b{cb}_{dots}",
                         dict(chain=n_iter, deconv_every=5, colored=True,
                              dots=dots, color_block=cb)))

    for name, kw in jobs:
        t0 = time.perf_counter()
        try:
            step = make_update_step(None, H, W, T, radius=radius,
                                    n_hals=1, **kw)
            step.lower(Y, st).compile()
            print(f"{name}: compiled in {time.perf_counter()-t0:.0f}s",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED ({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    main()
