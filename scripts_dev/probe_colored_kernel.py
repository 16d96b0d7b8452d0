"""Probe: colored Pallas HALS kernel on the real chip.

Verifies the free-block fast path (SMEM flags + traced-trip-count inner
loop) compiles under Mosaic and is bitwise-equal to the sequential path,
then times both at bench scale.

Run: PYTHONPATH=/root/repo python scripts_dev/probe_colored_kernel.py
"""

import time

import numpy as np


def force(x):
    import jax.numpy as jnp
    return float(jnp.sum(jnp.abs(x).astype(jnp.float32)))


def main():
    from cnmf_e_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from cnmf_e_tpu.ops.coloring import (block_free_flags, color_order,
                                         overlap_adjacency)
    from cnmf_e_tpu.ops.pallas_hals import hals_sweeps_rows_pallas

    H = W = 256
    K, T = 192, 2000
    d = H * W
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    A = np.zeros((K, d), np.float32)
    for k in range(K):
        cy, cx = rng.uniform(10, H - 10), rng.uniform(10, W - 10)
        blob = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 18.0)
        blob[blob < 1e-3] = 0
        A[k] = blob.ravel()
    C = np.abs(rng.standard_normal((K, T))).astype(np.float32)
    Cc = C - C.mean(1, keepdims=True)
    V = (Cc @ Cc.T).astype(np.float32)
    U = rng.standard_normal((K, d)).astype(np.float32) * 0.1

    Aj = jnp.asarray(A)
    M = Aj > 0
    order, inverse = color_order(overlap_adjacency(Aj))
    Up = jnp.asarray(U)[order]
    Vp = jnp.asarray(V)[order][:, order]
    Ap = Aj[order]
    Mp = M[order]
    Mf = Mp.astype(jnp.float32)
    flags = block_free_flags(Mf @ Mf.T, block=16)
    nfree = int(np.asarray(flags).sum())
    print(f"free blocks: {nfree}/{flags.shape[0]}", flush=True)

    gate = jnp.ones(K, jnp.float32)
    kw = dict(gate=gate, mask=Mp, n_iter=5, block=16, relu=True)
    t0 = time.perf_counter()
    seq = hals_sweeps_rows_pallas(Up, Vp, Ap, **kw)
    force(seq)
    print(f"seq compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    fast = hals_sweeps_rows_pallas(Up, Vp, Ap, flags=flags, **kw)
    force(fast)
    print(f"flags compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

    diff = float(jnp.max(jnp.abs(seq - fast)))
    print(f"max |seq - flags| = {diff}", flush=True)

    for name, fn in [("seq", lambda: hals_sweeps_rows_pallas(
                          Up, Vp, Ap, **kw)),
                     ("flags", lambda: hals_sweeps_rows_pallas(
                          Up, Vp, Ap, flags=flags, **kw))]:
        force(fn())
        t0 = time.perf_counter()
        for _ in range(3):
            force(fn())
        dt = (time.perf_counter() - t0) / 3
        print(f"{name}: {dt*1e3:.2f} ms (5 sweeps, spatial shape)",
              flush=True)


if __name__ == "__main__":
    main()
