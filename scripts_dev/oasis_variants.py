"""Time the batched OASIS deconvolution pieces on the real TPU.

Times pass 1 (sample kernel) at the default lane width, pass 2 (chunked
pool-merge kernel), the reconstruction kernel, and the jitted end-to-end
foopsi call, on bench-shaped traces (K=192, T=2000).
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
                                         _reconstruct_pallas,
                                         _pass1_lane_width)

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
timeit("noise_psd jitted", jax.jit(noise_psd), C)

# pass-1 shapes as used by oasis_ar1_pallas_dc at the bench config
Kp = 256
nc = -(-T // L)
Tp = nc * L
vin = jnp.concatenate(
    [jnp.tile(C, (2, 1))[:Kp], jnp.zeros((Kp, Tp - T), jnp.float32)], axis=1)
vc = vin.reshape(Kp * nc, L)
gc = jnp.repeat(jnp.tile(g, 2)[:Kp], nc)
sc = jnp.repeat(jnp.tile(3.0 * sn, 2)[:Kp], nc)
B1 = _pass1_lane_width(L, Kp * nc)
print(f"pass1 lane width B={B1}")
timeit("pass1 sample kernel",
       lambda vc, gc, sc: _oasis_pools_pallas(vc, gc, sc, B=B1)[0],
       vc, gc, sc)

v1, w1, ts1, l1, n1 = _oasis_pools_pallas(vc, gc, sc, B=B1)
offs = (jnp.arange(Kp * nc, dtype=jnp.int32) % nc) * L
ts1 = ts1 + offs[:, None]
print(f"pool counts after pass1: per-chunk max={int(jnp.max(n1))} "
      f"total mean={float(jnp.mean(jnp.sum(n1.reshape(Kp, nc), 1))):.1f}",
      flush=True)
g2 = jnp.tile(g, 2)[:Kp]
s2 = jnp.tile(3.0 * sn, 2)[:Kp]
args2 = (v1.reshape(Kp, nc, L), w1.reshape(Kp, nc, L),
         ts1.reshape(Kp, nc, L), l1.reshape(Kp, nc, L),
         n1.reshape(Kp, nc), g2, s2)
timeit("pass2 chunked pool-merge kernel",
       lambda *a: _pool_merge_pallas(*a)[0], *args2)

v, w, ts, ln, n = _pool_merge_pallas(*args2)
timeit("reconstruct kernel",
       lambda *a: _reconstruct_pallas(*a, Tp)[0], v, w, ts, ln, n, g2)

timeit("foopsi jitted end-to-end",
       jax.jit(lambda C, g, sn: foopsi_ar1(C, g, smin=-3.0, sn=sn,
                                           optimize_b=False).c),
       C, g, sn)
