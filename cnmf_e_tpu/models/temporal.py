"""Temporal (C) update with batched deconvolution.

Reference: ``update_temporal_parallel.m`` + ``HALS_temporal.m:58-107`` +
``deconvTemporal.m`` — per-neuron coordinate updates, per-trace baseline
subtraction (mean of sub-median samples), PSD noise, then OASIS
deconvolution per trace in a parfor. Here the coordinate sweep is one jitted
``fori`` loop and ALL traces deconvolve simultaneously through the vmapped
OASIS kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cnmf_e_tpu.config import CNMFEParams
from cnmf_e_tpu.models.state import CNMFEState
from cnmf_e_tpu.ops.hals import hals_temporal
from cnmf_e_tpu.ops.noise import noise_psd
from cnmf_e_tpu.ops.oasis import deconvolve


@functools.partial(jax.jit, static_argnames=("params",))
def update_temporal(Ysignal: jnp.ndarray, state: CNMFEState,
                    params: CNMFEParams) -> CNMFEState:
    """Update traces given footprints. Ysignal: (T, H, W) = Y - B."""
    tp = params.temporal
    T, H, W = Ysignal.shape
    K = state.K_max
    A = state.masked_A()
    Yd = Ysignal.reshape(T, H * W).T               # (d, T)
    Ad = A.reshape(K, H * W).T                     # (d, K)

    # colored=True: footprint-overlap independent-set ordering
    # (update_order.m:1-21) for the fused kernel's vectorized path
    C_raw, aa = hals_temporal(Yd, Ad, state.masked_C(), n_iter=tp.n_iter,
                              active=state.active, colored=True)

    # per-trace baseline: mean of sub-median samples (HALS_temporal.m:79)
    from cnmf_e_tpu.ops.stats import submedian_mean
    b = submedian_mean(C_raw, axis=-1)
    C_raw = C_raw - b[:, None]
    sn = noise_psd(C_raw)

    if tp.deconv.enabled:
        res = deconvolve(C_raw, tp.deconv, sn=sn)
        C_new = res.c
        C_raw_new = C_raw - res.b[:, None]
        S_new = res.s
        g_new = res.g[:, :state.g.shape[1]]
        # keep raw trace for neurons whose deconvolution collapsed to zero
        dead = jnp.sum(jnp.abs(C_new), axis=-1) == 0
        C_new = jnp.where(dead[:, None], C_raw_new, C_new)
    else:
        C_raw_new = C_raw
        C_new = C_raw - jnp.min(C_raw, axis=-1, keepdims=True)
        S_new = jnp.zeros_like(C_raw)
        g_new = state.g

    if tp.decorrelate and tp.deconv.enabled:
        from cnmf_e_tpu.ops.spikes import decorr_temporal
        C_new = decorr_temporal(C_new, S_new, A, g_new, sn,
                                gSiz=float(params.init.gSiz))

    act = state.active[:, None]
    return state.replace(
        C=jnp.where(act, C_new, 0.0),
        C_raw=jnp.where(act, C_raw_new, 0.0),
        S=jnp.where(act, S_new, 0.0),
        g=jnp.where(state.active[:, None], g_new, state.g),
        neuron_sn=jnp.where(state.active, sn, 0.0))
