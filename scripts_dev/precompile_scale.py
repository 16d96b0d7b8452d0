"""AOT-precompile the full-scale streaming programs into the persistent
compilation cache (jit.lower().compile() — the chipless AOT helper does
the work, no device memory is touched), so the scale run's later phases
load executables instead of compiling them mid-run.

Run concurrently with the transfer-bound temporal pass:
  PYTHONPATH=/root/repo python scripts_dev/precompile_scale.py [small]
"""

import sys
import time

from cnmf_e_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    small = len(sys.argv) > 1 and sys.argv[1] == "small"
    H = W = 256 if small else 512
    K_cap = 640 if small else 2304
    T = 20_000 if small else 100_000
    radius = 9
    fpb = 1000
    # must match models/streaming.py's sub_blocks sizing exactly, or the
    # precompiled shapes miss the cache
    sub = max(1, -(-fpb * H * W * 4 // (256 << 20)))
    chunk_T = -(-fpb // sub)
    d = H * W

    from cnmf_e_tpu.models.streaming import (_block_Bf, _block_spatial_U,
                                             _block_temporal_U_ring)
    from cnmf_e_tpu.ops.ring import (RingWeights, fit_ring_weights,
                                     ring_offsets)

    R = ring_offsets(radius).shape[0]
    nmax = 25 * R
    stride = max(-(-T // nmax), 1)
    n_grid = len(range(0, T, stride))

    f32 = jnp.float32
    S = jax.ShapeDtypeStruct
    Wt = RingWeights(w=S((d, R), f32), w0=S((d,), f32))
    i32w = S((), jnp.int32, weak_type=True)
    f32w = S((), f32, weak_type=True)
    jobs = [
        ("block_spatial_U",
         lambda: _block_spatial_U.lower(
             S((d, K_cap), f32), S((chunk_T, H, W), jnp.float16),
             S((d, K_cap), f32), S((K_cap, chunk_T), f32),
             S((H, W), f32), Wt, radius, H, W)),
        ("block_temporal_U_ring",
         lambda: _block_temporal_U_ring.lower(
             S((chunk_T, H, W), jnp.float16), S((d, K_cap), f32),
             S((K_cap, chunk_T), f32),
             S((H, W), f32), Wt, radius, H, W)),
        ("fit_ring_weights",
         lambda: fit_ring_weights.lower(
             S((n_grid, H, W), f32), H, W, radius, ridge_eps=f32w)),
    ]
    # the strided Bf pass yields two row counts (offset phases)
    for rows in sorted({fpb // stride, -(-fpb // stride)}):
        jobs.append((f"block_Bf_rows{rows}",
                     lambda rows=rows: _block_Bf.lower(
                         S((rows, H, W), jnp.float16),
                         S((d, K_cap), f32),
                         S((K_cap, n_grid), f32), S((H, W), f32), i32w)))
    for name, make in jobs:
        t0 = time.perf_counter()
        try:
            lowered = make()
            lowered.compile()
            print(f"{name}: compiled in {time.perf_counter()-t0:.0f}s",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED ({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    main()
