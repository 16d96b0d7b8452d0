"""Time the batched OASIS deconvolution variants on the real TPU.

Compares pass-1 lane widths (B) of the divide-and-conquer Pallas path and
the end-to-end foopsi call, on bench-shaped traces (K=192, T=2000).
PYTHONPATH must include the repo root.
"""

import time

import numpy as np

from cnmf_e_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from cnmf_e_tpu.ops.noise import noise_psd
from cnmf_e_tpu.ops.oasis import foopsi_ar1
from cnmf_e_tpu.ops.pallas_oasis import (_oasis_pools_pallas,
                                         _pool_merge_pallas,
                                         _pack_chunk_pools)

K, T, L = 192, 2000, 128
rng = np.random.default_rng(0)
C = jnp.asarray(np.abs(rng.standard_normal((K, T))), jnp.float32)
g = jnp.full((K,), 0.92, jnp.float32)


def timeit(name, fn, *args, n=5):
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


sn = noise_psd(C)
timeit("noise_psd (pow2 nfft)", jax.jit(noise_psd), C)

# pass-1 shapes as used by oasis_ar1_pallas_dc at the bench config
Kp = 256
nc = -(-T // L)
Tp = nc * L
vin = jnp.concatenate(
    [jnp.tile(C, (2, 1))[:Kp], jnp.zeros((Kp, Tp - T), jnp.float32)], axis=1)
vc = vin.reshape(Kp * nc, L)
gc = jnp.repeat(jnp.tile(g, 2)[:Kp], nc)
sc = jnp.repeat(jnp.tile(3.0 * sn, 2)[:Kp], nc)

ref = None
for B in (128, 2048):
    out = timeit(f"pass1 sample kernel B={B}",
                 lambda vc, gc, sc, B=B: _oasis_pools_pallas(vc, gc, sc, B=B)[0],
                 vc, gc, sc)
    if ref is None:
        ref = out
    else:
        print(f"   max|dv| vs B=128: {float(jnp.max(jnp.abs(out - ref))):.3e}")

# pass-2 timing: pack pass-1 pools, then the pool-merge kernel
v1, w1, ts1, l1, n1 = _oasis_pools_pallas(vc, gc, sc, B=2048)
offs = (jnp.arange(Kp * nc, dtype=jnp.int32) % nc) * L
ts1 = ts1 + offs[:, None]
pv, pw, pts, plen, n_in = _pack_chunk_pools(
    v1.reshape(Kp, nc, L), w1.reshape(Kp, nc, L),
    ts1.reshape(Kp, nc, L), l1.reshape(Kp, nc, L), n1.reshape(Kp, nc), Tp)
print(f"pool counts after pass1: max={int(jnp.max(n_in))} "
      f"mean={float(jnp.mean(n_in)):.1f}", flush=True)
g2 = jnp.tile(g, 2)[:Kp]
s2 = jnp.tile(3.0 * sn, 2)[:Kp]
timeit("pass2 pool-merge kernel",
       lambda *a: _pool_merge_pallas(*a)[0], pv, pw, pts, plen, n_in, g2, s2)

timeit("foopsi end-to-end",
       lambda C, g, sn: foopsi_ar1(C, g, smin=-3.0, sn=sn, optimize_b=False),
       C, g, sn)
