"""Test configuration: run on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of testing the parallel path without a
cluster (SURVEY.md section 4): the same kernels run on 1..8 virtual devices
and results must be shard-count invariant.
"""

import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
