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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled-program caches after each test module.

    The full 148-test suite accumulates hundreds of compiled XLA:CPU
    programs in one process; at ~97% of the run that state reproducibly
    segfaulted the XLA:CPU compiler inside a later large compile (see
    CLAUDE.md "test gate" note). Clearing between modules bounds the
    accumulation; within-module sharing (where nearly all reuse happens)
    is unaffected.
    """
    yield
    jax.clear_caches()
