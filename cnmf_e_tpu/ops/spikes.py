"""Event detection and temporal decorrelation.

Reference: ``Sources2D.event_detection`` (``Sources2D.m:1774-1793``) and
``decorrTemporal.m`` (suppress spikes of a neuron that are dominated by a
spatial neighbor, then re-convolve with the AR kernel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cnmf_e_tpu.ops.ar import ar_kernel


def event_detection(C: jnp.ndarray, neuron_sn: jnp.ndarray, sig: float = 5.0,
                    window: int = 10) -> jnp.ndarray:
    """Local-max events on traces: keep samples that are the running max of
    a ``window``-wide neighborhood and exceed the running min by
    ``sig * sn``. C: (K, T). Returns thresholded events (K, T)."""
    w = max(int(window), 1)
    neg = jnp.finfo(C.dtype).min
    pad = [(0, 0), (w // 2, w - 1 - w // 2)]
    Emax = jax.lax.reduce_window(C, neg, jax.lax.max, (1, w), (1, 1), pad)
    Emin = jax.lax.reduce_window(C, -neg, jax.lax.min, (1, w), (1, 1), pad)
    E = jnp.where(C >= Emax, C, 0.0)
    E = jnp.where(C - Emin >= sig * neuron_sn[:, None], E, 0.0)
    return E


def decorr_temporal(C: jnp.ndarray, S: jnp.ndarray, A: jnp.ndarray,
                    g: jnp.ndarray, neuron_sn: jnp.ndarray,
                    gSiz: float = 13.0, wd: int = 1,
                    kernel_len: int = 500) -> jnp.ndarray:
    """Reduce temporal crosstalk between neighboring neurons
    (``decorrTemporal.m``): normalize spikes by noise, zero any spike that
    is not the maximum among neurons within gSiz of its center, and rebuild
    C by convolving the surviving spikes with each neuron's AR kernel.

    C/S: (K, T); A: (K, H, W); g: (K, p). Returns the decorrelated C.
    """
    K, T = S.shape
    H, W = A.shape[1:]
    yy, xx = jnp.mgrid[0:H, 0:W]
    mass = jnp.sum(A, axis=(1, 2)) + 1e-12
    cy = jnp.sum(A * yy[None], axis=(1, 2)) / mass
    cx = jnp.sum(A * xx[None], axis=(1, 2)) / mass
    dist = jnp.sqrt((cy[:, None] - cy[None]) ** 2
                    + (cx[:, None] - cx[None]) ** 2)
    neigh = dist < gSiz                                   # (K, K) incl. self

    Sn = S / jnp.maximum(neuron_sn, 1e-12)[:, None]
    # per neuron: max over its neighbors at each time
    big = jnp.where(neigh[:, :, None], Sn[None, :, :], -jnp.inf)
    neigh_max = jnp.max(big, axis=1)                      # (K, T)
    dominated = Sn < neigh_max
    if wd > 1:
        kern = jnp.ones((1, 1, wd), Sn.dtype)
        dom = jax.lax.conv_general_dilated(
            dominated.astype(Sn.dtype)[:, None], kern, (1,),
            [(wd // 2, wd - 1 - wd // 2)],
            dimension_numbers=("NCH", "OIH", "NCH"))[:, 0] > 0
        dominated = dom
    S_kept = jnp.where(dominated, 0.0, S)

    # rebuild C = conv(S_kept, AR kernel), causal, per neuron
    L = min(kernel_len, T)
    h = ar_kernel(g, L)                                   # (K, L)
    out = jax.vmap(lambda s, k: jnp.convolve(s, k, mode="full")[:T])(
        S_kept, h)
    return out
