"""Micro-probes for the projection hotspots: scatter hints for the band
build, transpose vs pure-cast layout cost, padded flat layout."""

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
    from cnmf_e_tpu.ops.ring import ring_offsets

    H = W = 256
    T = 2000
    radius = 13
    offsets = ring_offsets(radius)
    R = offsets.shape[0]
    mr = int(np.abs(offsets).max())
    D = 2 * mr + 1
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((T, H, W)), jnp.float32)
    wm = jnp.asarray(rng.standard_normal((H, W, R)), jnp.float32)

    wcol = np.arange(W)
    d_idx = jnp.asarray(np.broadcast_to(
        (offsets[:, 0] + mr)[None, :], (W, R)))
    row_idx = jnp.asarray(wcol[:, None] + offsets[None, :, 1])
    col_idx = jnp.asarray(np.broadcast_to(wcol[:, None], (W, R)))

    @jax.jit
    def scatter_plain(wm):
        b = jnp.zeros((H, D, W, W), jnp.bfloat16)
        return b.at[:, d_idx, row_idx, col_idx].set(
            wm.astype(jnp.bfloat16), mode="drop")

    @jax.jit
    def scatter_hinted(wm):
        b = jnp.zeros((H, D, W, W), jnp.bfloat16)
        return b.at[:, d_idx, row_idx, col_idx].set(
            wm.astype(jnp.bfloat16), mode="drop", unique_indices=True)

    @jax.jit
    def cast_only(x):
        return x.astype(jnp.bfloat16)

    @jax.jit
    def pad_flat(x):
        xf = x.reshape(T, H * W).astype(jnp.bfloat16)
        return jnp.pad(xf, ((0, 48), (mr * W, mr * W)))

    print(f"scatter plain  : {timeit(scatter_plain, wm)*1e3:8.2f} ms")
    print(f"scatter hinted : {timeit(scatter_hinted, wm)*1e3:8.2f} ms")
    print(f"cast only      : {timeit(cast_only, X)*1e3:8.2f} ms")
    print(f"pad+flat+cast  : {timeit(pad_flat, X)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
