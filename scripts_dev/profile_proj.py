"""Decompose the background-projection cost (bands build / kernel /
layout+subtract) on the bench shapes. Run on the real TPU."""

import time

import numpy as np

import jax
import jax.numpy as jnp


def force(x):
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    return float(jnp.sum(jnp.abs(leaves[0]).astype(jnp.float32)))


def timeit(fn, *args):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    out = fn(*args)
    force(out)
    return time.perf_counter() - t0


def main():
    from cnmf_e_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from cnmf_e_tpu.ops.pallas_ring_mxu import (apply_ring_mxu,
                                                ring_dense_bands)
    from cnmf_e_tpu.ops.ring import RingWeights, ring_offsets

    H = W = 256
    T = 2000
    radius = 13
    R = ring_offsets(radius).shape[0]
    rng = np.random.default_rng(0)
    Y = jnp.asarray(rng.standard_normal((T, H, W)) * 0.1 + 1.0, jnp.float32)
    w = RingWeights(w=jnp.full((H * W, R), 1.0 / R, jnp.float32),
                    w0=jnp.zeros((H * W,), jnp.float32))

    bands_fn = jax.jit(lambda ww: ring_dense_bands(ww, H, W, radius))
    t_bands = timeit(bands_fn, w)
    bands = bands_fn(w)

    t_kernel = timeit(
        lambda b, x: apply_ring_mxu(b, w.w0, x, H, W, radius), bands, Y)

    @jax.jit
    def full(ww, x):
        b = ring_dense_bands(ww, H, W, radius)
        wq = apply_ring_mxu(b, ww.w0, x, H, W, radius)
        return ((x - wq).astype(jnp.bfloat16), b)

    t_full = timeit(full, w, Y)

    # layout probe: the (T,H,W)->(H,T,W) bf16 relayout alone
    @jax.jit
    def relayout(x):
        return jnp.moveaxis(x, 0, 1).astype(jnp.bfloat16)

    t_rel = timeit(relayout, Y)

    print(f"bands build : {t_bands*1e3:8.2f} ms")
    print(f"kernel      : {t_kernel*1e3:8.2f} ms (incl. in/out relayout)")
    print(f"in-relayout : {t_rel*1e3:8.2f} ms")
    print(f"full proj   : {t_full*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
