"""Ablation profile of one HALS iteration: time partial programs
(GA stencil -> +spatial -> +temporal -> +baseline -> +noise -> +deconv)
to localize per-iteration cost on the real TPU.

Run from anywhere: PYTHONPATH must include the repo root.
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
from cnmf_e_tpu.parallel.step import StepState, make_bg_projection

H = W = 256
T = 2000
K = 192
radius = 13
d = H * W
R = ring_offsets(radius).shape[0]
rng = np.random.default_rng(0)

Y = jnp.asarray(rng.standard_normal((T, H, W)) * 0.1 + 1.0, jnp.float32)
A = np.zeros((K, H, W), np.float32)
yy, xx = np.mgrid[0:H, 0:W]
for k in range(K):
    cy, cx = rng.uniform(10, H - 10), rng.uniform(10, W - 10)
    A[k] = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 18.0)
C = jnp.asarray(np.abs(rng.standard_normal((K, T))), jnp.float32)
Aj = jnp.asarray(A)
w = RingWeights(w=jnp.full((d, R), 1.0 / R, jnp.float32),
                w0=jnp.zeros((d,), jnp.float32))
g = jnp.full((K,), 0.92, jnp.float32)

st = StepState(A=Aj, C=C, C_raw=jnp.zeros((K, T), jnp.float32),
               S=jnp.zeros((K, T), jnp.float32), g=g,
               b0=jnp.ones((H, W), jnp.float32), ring_w=w.w, ring_w0=w.w0)
proj = make_bg_projection(None, H, W, T, radius=radius)
Pm = proj(Y, st)
Pmov, bands = Pm
float(jnp.sum(Pmov))
Pd = Pmov.reshape(T, d).T
zeros_w0 = jnp.zeros((d,), jnp.float32)


def stage(upto):
    def fn(Pd, A3, C):
        out = 0.0
        GA = apply_ring_mxu(bands, zeros_w0, A3, H, W, radius)
        GAd = GA.reshape(K, d).T
        out = jnp.sum(GAd)
        if upto >= 1:
            Cmean = jnp.mean(C, axis=1, keepdims=True)
            Cc = C - Cmean
            V = Cc @ Cc.T
            U = Pd @ Cc.T + GAd @ V
            Ad = A3.reshape(K, d).T
            Ad_new = hals_spatial_sweeps(U, V, Ad, n_iter=1)
            out = jnp.sum(Ad_new)
        if upto >= 2:
            Vt = Ad_new.T @ Ad_new
            GtA = Ad_new.T @ GAd
            Ut = Ad_new.T @ Pd + GtA @ C
            C_raw = hals_temporal_sweeps(Ut, Vt, C, n_iter=1)
            out = jnp.sum(C_raw)
        if upto >= 3:
            med = jnp.median(C_raw, axis=-1, keepdims=True)
            below = C_raw < med
            base = jnp.sum(jnp.where(below, C_raw, 0.0), axis=-1) / \
                jnp.maximum(jnp.sum(below, axis=-1), 1)
            C_raw = C_raw - base[:, None]
            out = jnp.sum(C_raw)
        if upto >= 4:
            sn = noise_psd(C_raw)
            out = jnp.sum(sn)
        if upto >= 5:
            res = foopsi_ar1(C_raw, g, smin=-3.0, sn=sn, optimize_b=False)
            out = jnp.sum(res.c)
        return out
    return jax.jit(fn)


NAMES = ["GA stencil", "+spatial HALS", "+temporal HALS", "+baseline/median",
         "+noise_psd", "+foopsi deconv"]

for upto, name in enumerate(NAMES):
    fn = stage(upto)
    t0 = time.perf_counter()
    float(fn(Pd, Aj, C))          # compile + run
    tc = time.perf_counter() - t0
    n = 5
    t0 = time.perf_counter()
    for _ in range(n - 1):
        fn(Pd, Aj, C)
    val = float(fn(Pd, Aj, C))    # one sync at the end
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:24s} {dt:9.2f} ms   (compile+first {tc:6.1f}s)",
          flush=True)

# the projection itself (movie-sized stencil), amortization reference
n = 3
t0 = time.perf_counter()
for _ in range(n):
    Pm = proj(Y, st)
float(jnp.sum(Pm.P))
print(f"{'projection (movie)':24s} "
      f"{(time.perf_counter() - t0) / n * 1000:9.2f} ms", flush=True)
