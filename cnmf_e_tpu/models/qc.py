"""Quality control: per-neuron defect tags and false-positive removal.

Reference: ``Sources2D.m:1683-1715`` (``tag_neurons_parallel`` bitmask:
1 = too few pixels, 2 = no spikes, 4 = zero-noise residual, 8 = low trace
PNR) and ``remove_false_positives`` (``Sources2D.m:744-759``).
"""

from __future__ import annotations

import jax.numpy as jnp

from cnmf_e_tpu.config import CNMFEParams
from cnmf_e_tpu.models.state import CNMFEState
from cnmf_e_tpu.ops.noise import noise_psd

TAG_FEW_PIXELS = 1
TAG_NO_SPIKES = 2
TAG_ZERO_RESIDUAL = 4
TAG_LOW_PNR = 8


def tag_neurons(state: CNMFEState, params: CNMFEParams) -> CNMFEState:
    qc = params.qc
    npix = jnp.sum(state.A > 0, axis=(1, 2))
    tags = (npix < qc.min_pixel).astype(jnp.int32) * TAG_FEW_PIXELS

    if params.temporal.deconv.enabled:
        n_spikes = jnp.sum(state.S[:, 1:] > 0, axis=-1)
        tags = tags + (n_spikes < qc.min_spike_count).astype(jnp.int32) * \
            TAG_NO_SPIKES

        resid_std = jnp.std(state.C_raw - state.C, axis=-1)
        raw_sn = noise_psd(state.C_raw)
        tags = tags + (resid_std / jnp.maximum(raw_sn, 1e-12) < 0.1
                       ).astype(jnp.int32) * TAG_ZERO_RESIDUAL

        pnr = jnp.max(state.C, axis=-1) / jnp.maximum(resid_std, 1e-12)
        tags = tags + (pnr < qc.min_pnr).astype(jnp.int32) * TAG_LOW_PNR

    tags = jnp.where(state.active, tags, 0)
    return state.replace(tags=tags)


def remove_false_positives(state: CNMFEState, params: CNMFEParams
                           ) -> CNMFEState:
    """Deactivate neurons with any defect tag (``Sources2D.m:744-759``)."""
    state = tag_neurons(state, params)
    bad = (state.tags != 0) & state.active
    keep = state.active & ~bad
    return state.replace(
        active=keep,
        A=state.A * keep[:, None, None],
        C=state.C * keep[:, None],
        C_raw=state.C_raw * keep[:, None],
        S=state.S * keep[:, None])


def delete_neurons(state: CNMFEState, indices) -> CNMFEState:
    """Deactivate neurons by slot index (reference ``Sources2D.delete``
    ``Sources2D.m:762-814``; also the consumer of the HTML report's
    ``decisions.json`` rejected list, ``utils/report.py``)."""
    indices = jnp.asarray(indices, jnp.int32).reshape(-1)
    keep = state.active & ~jnp.zeros_like(state.active).at[indices].set(True)
    return state.replace(
        active=keep,
        A=state.A * keep[:, None, None],
        C=state.C * keep[:, None],
        C_raw=state.C_raw * keep[:, None],
        S=state.S * keep[:, None])


def order_neurons(state: CNMFEState, by: str = "snr") -> jnp.ndarray:
    """Sort key per neuron (reference ``orderROIs`` ``Sources2D.m:573-653``).
    Returns the descending order permutation (host applies it if desired)."""
    if by == "snr":
        resid = jnp.std(state.C_raw - state.C, axis=-1)
        key = jnp.var(state.C, axis=-1) / jnp.maximum(resid**2, 1e-12)
    elif by == "energy":
        key = jnp.sum(state.A**2, axis=(1, 2)) * jnp.sum(state.C**2, axis=-1)
    elif by == "pnr":
        key = jnp.max(state.C, axis=-1) / jnp.maximum(
            noise_psd(state.C_raw), 1e-12)
    else:
        raise ValueError(f"unknown order key {by!r}")
    key = jnp.where(state.active, key, -jnp.inf)
    return jnp.argsort(-key)
