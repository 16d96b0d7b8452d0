"""Worker for tests/test_multihost.py::test_two_process_distributed_ingest.

Launched twice (process_id 0 and 1) with 4 virtual CPU devices each; both
read only their own frame range from a shared MovieStore, assemble the
global movie via ``jax.make_array_from_process_local_data`` across the
REAL process boundary, and verify a cross-process collective reduction
against the direct load (SURVEY §2.9 worker data plane).
"""

import os
import sys


def main():
    store_dir, coord, pid, nprocs = sys.argv[1:5]
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=int(nprocs),
                               process_id=int(pid))
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cnmf_e_tpu.io.store import MovieStore
    from cnmf_e_tpu.parallel.mesh import make_mesh
    from cnmf_e_tpu.parallel.multihost import (frame_range_for_process,
                                               load_sharded_movie)

    assert jax.process_count() == int(nprocs)
    assert len(jax.devices()) == 4 * int(nprocs)

    store = MovieStore(store_dir)
    T, H, W = store.shape
    mesh = make_mesh(n_patch=4, n_frame=int(nprocs))

    lo, hi = frame_range_for_process(T, mesh)
    span = hi - lo
    assert 0 < span < T, (lo, hi)       # each process reads a strict subset

    arr = load_sharded_movie(store, mesh)
    assert arr.shape == (T, H, W)

    # cross-process check: per-frame sums via a collective-backed jit,
    # replicated to every process, vs this process's direct local read
    out = jax.jit(lambda x: x.sum(axis=(1, 2)),
                  out_shardings=NamedSharding(mesh, P()))(arr)
    got = np.asarray(out)
    direct = store.read_frames(0, T).astype(np.float32).sum(axis=(1, 2))
    # reduction order differs across device shards: absolute tolerance
    # scaled for a 512-element f32 sum
    np.testing.assert_allclose(got, direct, rtol=1e-4, atol=1e-3)
    print(f"proc {pid}: OK frames [{lo}, {hi}) of {T}", flush=True)


if __name__ == "__main__":
    main()
