"""Tracing / profiling hooks.

Reference has only tic/toc prints (SURVEY.md section 5); here: a stage
timer that forces device completion (scalar fetch — ``block_until_ready``
does not block on the axon platform) and a JAX profiler trace context for
TensorBoard/perfetto dumps.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp


class StageTimer:
    """Accumulates wall time per named stage; forces async completion."""

    def __init__(self):
        self.times: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result_ref: Optional[list] = None):
        t0 = time.perf_counter()
        yield
        if result_ref:
            self.force(result_ref[0])
        dt = time.perf_counter() - t0
        self.times[name] = self.times.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    @staticmethod
    def force(x):
        """Block until ``x`` is computed (works on the axon tunnel)."""
        leaves = [l for l in jax.tree.leaves(x)
                  if hasattr(l, "dtype")]
        if leaves:
            float(jnp.sum(jnp.abs(leaves[0]).astype(jnp.float32)))
        return x

    def report(self) -> str:
        lines = ["stage timings:"]
        for k in sorted(self.times, key=lambda k: -self.times[k]):
            lines.append(f"  {k:<28s} {self.times[k]:8.3f}s "
                         f"(x{self.counts[k]})")
        return "\n".join(lines)


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """Dump a JAX profiler trace viewable in TensorBoard / perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
