"""JAX persistent compilation cache setup.

On the tunneled TPU platform, Mosaic/XLA compilation of the full pipeline
takes minutes; the persistent cache makes every run after the first load
compiled executables from disk.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "CNMFE_TPU_CACHE", os.path.expanduser("~/.cache/cnmf_e_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags
