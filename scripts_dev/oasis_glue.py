"""Time the XLA glue around the OASIS Pallas kernels (jitted pieces)."""

import time

import numpy as np

from cnmf_e_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from cnmf_e_tpu.ops.noise import noise_psd, welch_psd
from cnmf_e_tpu.ops.oasis import foopsi_ar1
from cnmf_e_tpu.ops.pallas_oasis import (_oasis_pools_pallas,
                                         _pack_chunk_pools, _reconstruct)

K, T, L = 192, 2000, 128
Kp, nc = 256, 16
Tp = nc * L
rng = np.random.default_rng(0)
C = jnp.asarray(np.abs(rng.standard_normal((K, T))), jnp.float32)
g = jnp.full((K,), 0.92, jnp.float32)


def timeit(name, fn, *args, n=10):
    t0 = time.perf_counter()
    out = fn(*args)
    f = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(f.c if hasattr(f, "c") else f))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    f = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(f.c if hasattr(f, "c") else f))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:34s} {dt:9.2f} ms   (compile+first {tc:6.1f}s)",
          flush=True)
    return out


cv = jnp.asarray(rng.standard_normal((Kp, nc, L)), jnp.float32)
cw = jnp.abs(cv) + 1.0
cts = jnp.asarray(rng.integers(0, L, (Kp, nc, L)), jnp.int32)
cl = jnp.ones((Kp, nc, L), jnp.int32)
cn = jnp.asarray(rng.integers(1, 20, (Kp, nc)), jnp.int32)

timeit("pack_chunk_pools (argsort)",
       jax.jit(lambda *a: _pack_chunk_pools(*a, Tp)[0]), cv, cw, cts, cl, cn)

pv = jnp.asarray(np.abs(rng.standard_normal((Kp, Tp))), jnp.float32)
pw = pv + 1.0
pts = jnp.asarray(np.sort(rng.integers(0, Tp, (Kp, Tp)), axis=1), jnp.int32)
pln = jnp.ones((Kp, Tp), jnp.int32)
nn = jnp.asarray(rng.integers(5, 25, (Kp,)), jnp.int32)
gp = jnp.full((Kp,), 0.92, jnp.float32)

timeit("reconstruct (scatter+cumsum)",
       jax.jit(lambda *a: _reconstruct(*a, Tp)[0]), pv, pw, pts, pln, nn, gp)

sn = noise_psd(C)
timeit("noise_psd jitted", jax.jit(noise_psd), C)
timeit("welch_psd jitted", jax.jit(lambda y: welch_psd(y)[0]), C)
timeit("frames gather only",
       jax.jit(lambda y: y[..., np.arange(8)[:, None] * 222
                          + np.arange(444)[None, :]]), C)

timeit("foopsi jitted end-to-end",
       jax.jit(lambda C, g, sn: foopsi_ar1(C, g, smin=-3.0, sn=sn,
                                           optimize_b=False).c),
       C, g, sn)
