"""Chained-iteration drift probe for the sweep kernel's dot precision.

Round 4 rejected single-pass bf16 dots ("fast") after one 10-iteration
chain drifted the deconvolved C by 33% max-rel. This probe runs the SAME
chain with each dot mode against the exact (HIGHEST) path and prints the
max/rms relative drift of A and C — the promotion gate for making
``hi_lo`` (3-pass bf16 split) the headline variant is max-rel <= 1e-3
(r4 verdict item 2).

Run on the real chip (quiet tunnel):
  PYTHONPATH=/root/repo python scripts_dev/chain_drift.py
"""

import time

import numpy as np

from cnmf_e_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

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
    rng = np.random.default_rng(0)

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

    def run(dots):
        step = make_update_step(None, H, W, T, radius=radius, n_hals=1,
                                chain=n_iter, deconv_every=5,
                                colored=True, dots=dots)
        t0 = time.perf_counter()
        out = step(Y, st0)
        a = np.asarray(out.A)
        c = np.asarray(out.C)
        print(f"  [{dots}] chain done in {time.perf_counter()-t0:.1f}s "
              f"(incl. compile on first call)", flush=True)
        return a, c

    a_ref, c_ref = run("highest")

    def drift(x, ref):
        scale = np.maximum(np.abs(ref), 0.05 * np.abs(ref).max())
        rel = np.abs(x - ref) / scale
        return float(rel.max()), float(np.sqrt(np.mean(rel ** 2)))

    for dots in ("hi_lo", "fast"):
        a, c = run(dots)
        am, ar = drift(a, a_ref)
        cm, cr = drift(c, c_ref)
        verdict = "PROMOTABLE" if max(am, cm) <= 1e-3 else "rejected"
        print(f"{dots}: A max-rel {am:.2e} rms {ar:.2e} | "
              f"C max-rel {cm:.2e} rms {cr:.2e} -> {verdict}", flush=True)


if __name__ == "__main__":
    main()
