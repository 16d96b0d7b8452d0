"""Probe the class-scheduled sweep kernel's block size / dot mode on the
real chip (quiet tunnel): one chained colored update per config at bench
shapes, reporting iteration wall time.

  PYTHONPATH=/root/repo python scripts_dev/probe_sched_block.py [blocks...]
"""

import sys
import time

import numpy as np

from cnmf_e_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from cnmf_e_tpu.ops.ring import ring_offsets  # noqa: E402
from cnmf_e_tpu.parallel.step import StepState, make_update_step  # noqa
from cnmf_e_tpu.utils.profiling import StageTimer  # noqa: E402


def main():
    H = W = 256
    T = 2000
    K = 192
    radius = 13
    n_iter = 10
    R = ring_offsets(radius).shape[0]
    rng = np.random.default_rng(0)
    blocks = [int(a) for a in sys.argv[1:]] or [16, 32, 64, 128]

    Y = jnp.asarray(rng.standard_normal((T, H, W)) * 0.1 + 1.0,
                    jnp.float32)
    A = np.zeros((K, H, W), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    for k in range(K):
        cy, cx = rng.uniform(10, H - 10), rng.uniform(10, W - 10)
        A[k] = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 18.0)
    A[A < 1e-3] = 0.0
    C = np.abs(rng.standard_normal((K, T))).astype(np.float32)
    st0 = StepState(
        A=jnp.asarray(A), C=jnp.asarray(C),
        C_raw=jnp.zeros((K, T), jnp.float32),
        S=jnp.zeros((K, T), jnp.float32),
        g=jnp.full((K,), 0.92, jnp.float32),
        b0=jnp.ones((H, W), jnp.float32),
        ring_w=jnp.full((H * W, R), 1.0 / R, jnp.float32),
        ring_w0=jnp.zeros((H * W,), jnp.float32),
    )

    def force(x):
        float(jnp.sum(x[:1, :1]))

    for dots in ("highest", "hi_lo"):
        for cb in blocks:
            step = make_update_step(None, H, W, T, radius=radius,
                                    n_hals=1, chain=n_iter,
                                    deconv_every=5, colored=True,
                                    dots=dots, color_block=cb)
            out = step(Y, st0)
            force(out.C)
            out = step(Y, out)
            force(out.C)
            t0 = time.perf_counter()
            out = step(Y, out)
            force(out.C)
            dt = (time.perf_counter() - t0) / n_iter
            mpfs = H * W * T / dt / 1e6
            print(f"dots={dots:8s} color_block={cb:4d}: "
                  f"{dt*1e3:6.2f} ms/iter  {mpfs:8.0f} Mpf/s", flush=True)


if __name__ == "__main__":
    main()
