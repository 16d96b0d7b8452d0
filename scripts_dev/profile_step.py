"""Per-stage timing of the update step on the real TPU (dev tool)."""
import time

import numpy as np

from cnmf_e_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from cnmf_e_tpu.ops.ring import RingWeights, apply_ring, ring_offsets
from cnmf_e_tpu.ops.pallas_ring import apply_ring_pallas
from cnmf_e_tpu.ops.noise import noise_psd
from cnmf_e_tpu.ops.oasis import foopsi_ar1
from cnmf_e_tpu.parallel.step import (StepState, make_bg_projection,
                                      make_hals_iteration)

H = W = 256
T = 2000
K = 192
radius = 13
R = ring_offsets(radius).shape[0]
rng = np.random.default_rng(0)

Y = jnp.asarray(rng.standard_normal((T, H, W)) * 0.1 + 1.0, jnp.float32)
A = np.zeros((K, H, W), np.float32)
yy, xx = np.mgrid[0:H, 0:W]
for k in range(K):
    cy, cx = rng.uniform(10, H - 10), rng.uniform(10, W - 10)
    A[k] = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 18.0)
Aj = jnp.asarray(A)
C = jnp.asarray(np.abs(rng.standard_normal((K, T))).astype(np.float32))
wr = jnp.full((H * W, R), 1.0 / R, jnp.float32)
w0 = jnp.zeros((H * W,), jnp.float32)
weights = RingWeights(w=wr, w0=w0)
Pd = jnp.asarray(rng.standard_normal((H * W, T)).astype(np.float32))
Ad = Aj.reshape(K, -1).T


def force(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def bench(name, fn, *args, n=3):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        force(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:42s} {dt:9.2f} ms", flush=True)
    return dt


f_ring_pallas = jax.jit(lambda w, x: apply_ring_pallas(w, x, H, W, radius))
f_ring_xla_A = jax.jit(lambda w, a: apply_ring(w, a, H, W, radius,
                                               include_intercept=False))
f_matmul_PC = jax.jit(lambda p, c: p @ c.T)              # (d,T)@(T,K)
f_matmul_AP = jax.jit(lambda a, p: a.T @ p)              # (K,d)@(d,T)
f_deconv = jax.jit(lambda c, g, sn: foopsi_ar1(c, g, smin=-3.0, sn=sn,
                                               optimize_b=False))
f_noise = jax.jit(noise_psd)


def f_median(c):
    med = jnp.median(c, axis=-1, keepdims=True)
    below = c < med
    base = jnp.sum(jnp.where(below, c, 0.0), axis=-1) / \
        jnp.maximum(jnp.sum(below, axis=-1), 1)
    return c - base[:, None]


f_median = jax.jit(f_median)

g = jnp.full((K,), 0.92, jnp.float32)
sn = jnp.ones((K,), jnp.float32)

bench("ring apply pallas (movie)", f_ring_pallas, weights, Y)
bench("ring apply XLA (K footprints)", f_ring_xla_A, weights, Aj)
bench("matmul Pd@Cc.T (d,T)x(T,K)", f_matmul_PC, Pd, C)
bench("matmul A.T@Pd (K,d)x(d,T)", f_matmul_AP, Ad, Pd)
bench("noise_psd (K,T)", f_noise, C)
bench("foopsi_ar1 (K,T)", f_deconv, C, g, sn)
bench("median/baseline (K,T)", f_median, C)

st = StepState(A=Aj, C=C, C_raw=jnp.zeros((K, T), jnp.float32),
               S=jnp.zeros((K, T), jnp.float32), g=g,
               b0=jnp.ones((H, W), jnp.float32), ring_w=wr, ring_w0=w0)
proj = make_bg_projection(None, H, W, T, radius=radius)
it_d = make_hals_iteration(None, H, W, T, radius=radius, n_hals=1)
it_c = make_hals_iteration(None, H, W, T, radius=radius, n_hals=1,
                           crop_box=48)
Pm = proj(Y, st)
force(Pm)
bench("PROJECTION (movie stencil)", lambda: proj(Y, st))
bench("ITERATION dense", lambda: it_d(Pm, st))
bench("ITERATION crop=48", lambda: it_c(Pm, st))
