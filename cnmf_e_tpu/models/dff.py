"""DF/F extraction.

Reference: ``extract_DF_F_endoscope`` (``Sources2D.m:540-570``) — project the
background movie onto each (normalized) footprint to get the per-neuron
baseline fluorescence, take its median / running percentile as F0, and
divide the traces.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cnmf_e_tpu.config import CNMFEParams
from cnmf_e_tpu.models.background import background_of
from cnmf_e_tpu.models.state import CNMFEState


def running_percentile(x: jnp.ndarray, window: int, q: float) -> jnp.ndarray:
    """Causal-centered running percentile along the last axis via strided
    window quantiles (reference: ``utilities/running_percentile.m``)."""
    T = x.shape[-1]
    half = window // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(half, half)], mode="edge")
    idx = jnp.arange(T)[:, None] + jnp.arange(window)[None, :]
    frames = xp[..., idx]                      # (..., T, window)
    return jnp.quantile(frames, q / 100.0, axis=-1)


def extract_dff(Y: jnp.ndarray, state: CNMFEState, params: CNMFEParams,
                window: Optional[int] = None, prctile: float = 50.0,
                baseline: str = "percentile"
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (C_df, C_raw_df, F0). Y: (T, H, W) raw movie.

    F0 is per neuron: the percentile of the footprint-projected background
    (whole-session if ``window`` is None, else a running percentile).
    ``baseline="mode"`` instead takes the mode of the fluorescence
    distribution via the Botev diffusion KDE — the reference
    ``extract_DF_F.m`` path (``ops/kde.py``; host-side, export-time only).
    """
    T, H, W = Y.shape
    K = state.K_max
    B = background_of(Y, state, params)                  # (T, H, W)
    A = state.masked_A().reshape(K, H * W)
    norm = jnp.sum(A * A, axis=1)
    An = A / jnp.maximum(norm, 1e-12)[:, None]
    Ybg = jnp.einsum("kd,td->kt", An, B.reshape(T, H * W))  # (K, T)

    if baseline == "mode":
        import numpy as np
        from cnmf_e_tpu.ops.kde import mode_baseline
        Ybg_np = np.asarray(Ybg)
        F0 = jnp.asarray([[mode_baseline(row)] for row in Ybg_np],
                         Ybg.dtype)
    elif window is None or window >= T:
        F0 = jnp.percentile(Ybg, prctile, axis=-1)[:, None]
    else:
        F0 = running_percentile(Ybg, window, prctile)
    F0 = jnp.maximum(F0, 1e-12)
    C_df = state.C / F0
    C_raw_df = state.C_raw / F0
    act = state.active[:, None]
    return jnp.where(act, C_df, 0.0), jnp.where(act, C_raw_df, 0.0), F0


def extract_dff_batches(blocks, batch_states, final_state: CNMFEState,
                        params: CNMFEParams, window: Optional[int] = None,
                        prctile: float = 50.0
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """DF/F for batch-mode results: the footprint-projected background is
    accumulated block by block (each block uses its own batch's background
    model), F0 is then the whole-session percentile — so long recordings
    get the same baseline semantics as the in-memory path.

    ``final_state`` holds the concatenated traces (from ``fit_batches``).
    """
    K = final_state.K_max
    A = final_state.masked_A().reshape(K, -1)
    norm = jnp.sum(A * A, axis=1)
    An = A / jnp.maximum(norm, 1e-12)[:, None]
    Ybg_parts = []
    for Yb, st_b in zip(blocks, batch_states):
        Yb = jnp.asarray(Yb, jnp.float32)
        Tb = Yb.shape[0]
        B = background_of(Yb, st_b, params)
        Ybg_parts.append(jnp.einsum("kd,td->kt", An, B.reshape(Tb, -1)))
    Ybg = jnp.concatenate(Ybg_parts, axis=-1)             # (K, T_total)
    T = Ybg.shape[-1]
    if window is None or window >= T:
        F0 = jnp.percentile(Ybg, prctile, axis=-1)[:, None]
    else:
        F0 = running_percentile(Ybg, window, prctile)
    F0 = jnp.maximum(F0, 1e-12)
    act = final_state.active[:, None]
    return (jnp.where(act, final_state.C / F0, 0.0),
            jnp.where(act, final_state.C_raw / F0, 0.0), F0)
