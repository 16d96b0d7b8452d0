"""Stage-by-stage profile of one HALS iteration on the real TPU.

Each stage is timed as a standalone jitted program with precomputed inputs
(GA passed in, not recomputed) so most programs are small pure-XLA compiles;
the two Pallas programs (MXU stencil, OASIS deconv) come last.

PYTHONPATH must include the repo root.
"""

import time

import numpy as np

from cnmf_e_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from cnmf_e_tpu.ops.hals import hals_spatial_sweeps, hals_temporal_sweeps
from cnmf_e_tpu.ops.noise import noise_psd
from cnmf_e_tpu.ops.oasis import foopsi_ar1
from cnmf_e_tpu.ops.ring import RingWeights, ring_offsets
from cnmf_e_tpu.ops.pallas_ring_mxu import apply_ring_mxu, ring_dense_bands

H = W = 256
T = 2000
K = 192
radius = 13
d = H * W
R = ring_offsets(radius).shape[0]
rng = np.random.default_rng(0)

Pd = jnp.asarray(rng.standard_normal((d, T)) * 0.1, jnp.float32)
A = np.zeros((K, H, W), np.float32)
yy, xx = np.mgrid[0:H, 0:W]
for k in range(K):
    cy, cx = rng.uniform(10, H - 10), rng.uniform(10, W - 10)
    A[k] = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 18.0)
Aj = jnp.asarray(A)
Ad = Aj.reshape(K, d).T
GAd = jnp.asarray(rng.standard_normal((d, K)) * 0.01, jnp.float32)
C = jnp.asarray(np.abs(rng.standard_normal((K, T))), jnp.float32)
g = jnp.full((K,), 0.92, jnp.float32)
w = RingWeights(w=jnp.full((d, R), 1.0 / R, jnp.float32),
                w0=jnp.zeros((d,), jnp.float32))
zeros_w0 = jnp.zeros((d,), jnp.float32)


def timeit(name, fn, *args, n=5):
    t0 = time.perf_counter()
    float(jnp.sum(fn(*args)))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n - 1):
        out = fn(*args)
    out = fn(*args)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:26s} {dt:9.2f} ms   (compile+first {tc:6.1f}s)",
          flush=True)


@jax.jit
def s_spatial(Pd, GAd, Ad, C):
    Cc = C - jnp.mean(C, axis=1, keepdims=True)
    V = Cc @ Cc.T
    U = Pd @ Cc.T + GAd @ V
    return hals_spatial_sweeps(U, V, Ad, n_iter=1)


@jax.jit
def s_temporal(Pd, GAd, Ad, C):
    Vt = Ad.T @ Ad
    GtA = Ad.T @ GAd
    Ut = Ad.T @ Pd + GtA @ C
    return hals_temporal_sweeps(Ut, Vt, C, n_iter=1)


@jax.jit
def s_baseline(C):
    med = jnp.median(C, axis=-1, keepdims=True)
    below = C < med
    base = jnp.sum(jnp.where(below, C, 0.0), axis=-1) / \
        jnp.maximum(jnp.sum(below, axis=-1), 1)
    return C - base[:, None]


@jax.jit
def s_noise(C):
    return noise_psd(C)


@jax.jit
def s_deconv(C, g, sn):
    return foopsi_ar1(C, g, smin=-3.0, sn=sn, optimize_b=False).c


@jax.jit
def s_ga(bands, Aj):
    return apply_ring_mxu(bands, zeros_w0, Aj, H, W, radius)


timeit("spatial HALS (Grams)", s_spatial, Pd, GAd, Ad, C)
timeit("temporal HALS (Grams)", s_temporal, Pd, GAd, Ad, C)
timeit("baseline/median", s_baseline, C)
timeit("noise_psd", s_noise, C)
sn = s_noise(C)
timeit("foopsi deconv (pallas)", s_deconv, C, g, sn)
bands = ring_dense_bands(w, H, W, radius)
float(jnp.sum(bands.astype(jnp.float32)))
timeit("GA stencil (pallas MXU)", s_ga, bands, Aj)
