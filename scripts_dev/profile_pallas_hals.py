"""Validate + time the fused Pallas HALS kernel on the real chip vs the
XLA blocked path (bench shapes: d=256x256, K=192, T=2000)."""
import time

import numpy as np

from cnmf_e_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from cnmf_e_tpu.ops.hals import hals_spatial_sweeps, hals_temporal_sweeps
from cnmf_e_tpu.ops.pallas_hals import hals_sweeps_rows_pallas


def force(x):
    return float(jnp.sum(jnp.abs(x).astype(jnp.float32)))


def main():
    rng = np.random.default_rng(0)
    d, K, T, n_iter = 256 * 256, 192, 2000, 5
    A = np.maximum(rng.standard_normal((K, d)), 0).astype(np.float32)
    C = np.abs(rng.standard_normal((K, T))).astype(np.float32)
    Cc = C - C.mean(1, keepdims=True)
    V = (Cc @ Cc.T).astype(np.float32)
    U = (0.5 * rng.standard_normal((K, d))).astype(np.float32)
    Uj, Vj, Aj = jnp.asarray(U), jnp.asarray(V), jnp.asarray(A)
    gate = jnp.ones(K, jnp.float32)

    t0 = time.perf_counter()
    out_p = hals_sweeps_rows_pallas(Uj, Vj, Aj, gate=gate, n_iter=n_iter)
    force(out_p)
    print(f"pallas spatial compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)
    out_x = hals_spatial_sweeps(Uj.T, Vj, Aj.T, n_iter=n_iter).T
    err = float(jnp.max(jnp.abs(out_p - out_x)))
    rel = err / float(jnp.max(jnp.abs(out_x)))
    print(f"spatial max abs diff vs XLA: {err:.3e} (rel {rel:.2e})",
          flush=True)

    # timing: several calls, steady state
    for tag, fn in (
        ("pallas", lambda: hals_sweeps_rows_pallas(Uj, Vj, Aj, gate=gate,
                                                   n_iter=n_iter)),
        ("xla", lambda: hals_spatial_sweeps(Uj.T, Vj, Aj.T,
                                            n_iter=n_iter))):
        force(fn())
        force(fn())
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn()
        force(out)
        print(f"spatial {tag}: {(time.perf_counter()-t0)/5*1e3:.2f} ms "
              f"(5 sweeps, d={d}, K={K})", flush=True)

    # temporal shapes
    Ut = jnp.asarray(rng.standard_normal((K, T)).astype(np.float32))
    Vt = jnp.asarray((A @ A.T).astype(np.float32))
    C0 = jnp.asarray(C)
    t0 = time.perf_counter()
    out_tp = hals_sweeps_rows_pallas(Ut, Vt, C0, gate=gate, n_iter=n_iter,
                                     relu=False)
    force(out_tp)
    print(f"pallas temporal compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)
    out_tx = hals_temporal_sweeps(Ut, Vt, C0, n_iter=n_iter,
                                  use_pallas=False)
    errt = float(jnp.max(jnp.abs(out_tp - out_tx)))
    print(f"temporal max abs diff vs XLA: {errt:.3e}", flush=True)
    for tag, fn in (
        ("pallas", lambda: hals_sweeps_rows_pallas(Ut, Vt, C0, gate=gate,
                                                   n_iter=n_iter,
                                                   relu=False)),
        ("xla", lambda: hals_temporal_sweeps(Ut, Vt, C0, n_iter=n_iter,
                                             use_pallas=False))):
        force(fn())
        force(fn())
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn()
        force(out)
        print(f"temporal {tag}: {(time.perf_counter()-t0)/5*1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
