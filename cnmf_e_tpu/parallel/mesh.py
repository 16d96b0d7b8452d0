"""Mesh construction and canonical shardings.

Layout contract (all jit programs rely on it; XLA propagates the rest):

  Y (T, H, W)   : T over 'frame', H over 'patch'   — the movie
  A (K, H, W)   : H over 'patch', replicated over 'frame'
  C/S (K, T)    : T over 'frame' for factor math; resharded to K over
                  'patch' for per-trace deconvolution (survey 2.9's
                  "per-trace parallelism")
  b0/sn (H, W)  : H over 'patch'
  ring W (d, R) : d over 'patch'
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_patch: int = 0, n_frame: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (patch, frame) mesh. n_patch=0 uses all available devices.

    The 'frame' axis varies SLOWEST over the device list: consecutive
    devices (one host's chips, dense ICI) share a frame shard and split
    the patch axis, while frame shards span hosts — so multihost ingest
    reads disjoint contiguous frame ranges per process
    (``parallel/multihost.py``) and the stencil halo exchange on 'patch'
    stays on intra-host ICI."""
    devices = list(devices if devices is not None else jax.devices())
    if n_patch <= 0:
        n_patch = len(devices) // n_frame
    assert n_patch * n_frame <= len(devices), (
        f"need {n_patch * n_frame} devices, have {len(devices)}")
    grid = np.array(devices[: n_patch * n_frame]).reshape(n_frame, n_patch)
    return Mesh(grid.T, ("patch", "frame"))


def movie_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("frame", "patch", None))


def footprint_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, "patch", None))


def trace_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, "frame"))


def trace_neuron_sharding(mesh: Mesh) -> NamedSharding:
    """Traces sharded over neurons (for batched deconvolution)."""
    return NamedSharding(mesh, P("patch", None))


def image_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("patch", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
