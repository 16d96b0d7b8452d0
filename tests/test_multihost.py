"""Multi-host ingest path on the virtual device mesh (single process: the
process-local data covers every shard, which exercises the same assembly
code path as the N-host case)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from cnmf_e_tpu.io.store import distribute_movie
from cnmf_e_tpu.parallel.mesh import make_mesh
from cnmf_e_tpu.parallel.multihost import (frame_range_for_process,
                                           init_distributed,
                                           load_sharded_movie)


@pytest.fixture
def store(tmp_path, rng):
    Y = rng.standard_normal((100, 16, 32)).astype(np.float32)
    src = str(tmp_path / "mov.npy")
    np.save(src, Y)
    return Y, distribute_movie(src, str(tmp_path / "store"),
                               frames_per_block=30)


def test_init_distributed_single_process_noop():
    assert init_distributed() == 0


def test_frame_range_covers_all_frames_single_process(store):
    _, st = store
    mesh = make_mesh(n_patch=4, n_frame=2)
    lo, hi = frame_range_for_process(100, mesh)
    assert (lo, hi) == (0, 100)


def test_load_sharded_movie_matches_direct(store):
    Y, st = store
    mesh = make_mesh(n_patch=4, n_frame=2)
    arr = load_sharded_movie(st, mesh)
    assert arr.shape == (100, 16, 32)
    np.testing.assert_allclose(np.asarray(arr), Y, rtol=1e-6)
    # sharded as expected: frame axis split over 'frame'
    assert arr.sharding.spec == jax.sharding.PartitionSpec(
        "frame", "patch", None)


def test_load_sharded_movie_pads_ragged_T(store):
    Y, st = store
    mesh = make_mesh(n_patch=2, n_frame=4)   # 100 % 4 == 0 -> use T=100
    arr = load_sharded_movie(st, mesh)
    np.testing.assert_allclose(np.asarray(arr), Y, rtol=1e-6)


@pytest.mark.slow
def test_two_process_distributed_ingest(tmp_path):
    """Exercise ``make_array_from_process_local_data`` across a REAL
    process boundary: two CPU processes (4 virtual devices each) under
    ``jax.distributed``, each reading only its own frame range, then a
    cross-process collective reduction checked against a direct load."""
    import socket
    import subprocess
    import sys

    rng = np.random.default_rng(7)
    Y = rng.standard_normal((96, 16, 32)).astype(np.float32)
    src = str(tmp_path / "mov.npy")
    np.save(src, Y)
    distribute_movie(src, str(tmp_path / "store"), frames_per_block=24)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(REPO, "tests", "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(tmp_path / "store"), coord,
         str(i), "2"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: OK" in out


def test_sharded_movie_feeds_update_step(store):
    """The ingested array drives the distributed step directly."""
    Y, st = store
    from cnmf_e_tpu.ops.ring import ring_offsets
    from cnmf_e_tpu.parallel.step import StepState, make_update_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(n_patch=4, n_frame=2)
    arr = load_sharded_movie(st, mesh)
    T, H, W = arr.shape
    K, radius = 4, 3
    R = ring_offsets(radius).shape[0]
    rng = np.random.default_rng(0)
    put = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
    state = StepState(
        A=put(jnp.abs(jnp.asarray(rng.standard_normal((K, H, W)),
                                  jnp.float32)), P(None, "patch", None)),
        C=put(jnp.abs(jnp.asarray(rng.standard_normal((K, T)),
                                  jnp.float32)), P(None, "frame")),
        C_raw=put(jnp.zeros((K, T), jnp.float32), P(None, "frame")),
        S=put(jnp.zeros((K, T), jnp.float32), P(None, "frame")),
        g=put(jnp.full((K,), 0.9, jnp.float32), P()),
        b0=put(jnp.zeros((H, W), jnp.float32), P("patch", None)),
        ring_w=put(jnp.zeros((H * W, R), jnp.float32), P("patch", None)),
        ring_w0=put(jnp.zeros((H * W,), jnp.float32), P("patch")),
    )
    step = make_update_step(mesh, H, W, T, radius=radius, n_hals=1)
    out = step(arr, state)
    jax.block_until_ready(out)
    assert out.C.shape == (K, T)
    assert np.isfinite(np.asarray(out.C)).all()
