"""Temporal batch mode: recordings longer than device memory.

Reference: ``getReady_batch`` / ``initComponents_batch`` /
``update_{spatial,temporal,background}_batch`` / ``concatenate_temporal_batch``
(``Sources2D.m:268-325,708-738``): the movie splits into frame-range batches;
A is shared across batches (synchronized by cc-weighted averaging,
``update_spatial_batch.m:20-35``), C solves per batch and concatenates.

Here each batch is an in-memory (T_b, H, W) slab streamed from a
:class:`~cnmf_e_tpu.io.store.MovieStore` (or any sequence of arrays); the
first batch runs the full pipeline, later batches inherit A, fit their own
background + traces, and a final spatial-sync pass averages the per-batch
footprints exactly (the frame-axis Gram sums add across batches — the
sharded-T mesh does the same with a psum when batches fit on devices).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from cnmf_e_tpu.config import CNMFEParams
from cnmf_e_tpu.models.background import subtract_background, update_background
from cnmf_e_tpu.models.pipeline import CNMFE
from cnmf_e_tpu.models.state import CNMFEState
from cnmf_e_tpu.models.temporal import update_temporal
from cnmf_e_tpu.models.spatial import update_spatial


def init_traces_given_A(Y: jnp.ndarray, state: CNMFEState,
                        params: CNMFEParams) -> CNMFEState:
    """Solve C for a new frame batch with A fixed (reference:
    ``initTemporal.m``): rough C from the footprint projection, then the
    full temporal update (HALS + deconvolution)."""
    T, H, W = Y.shape
    K = state.K_max
    A = state.masked_A()
    Ad = A.reshape(K, -1)
    aa = jnp.sum(Ad * Ad, axis=1)
    C0 = (Ad @ Y.reshape(T, -1).T) / jnp.maximum(aa, 1e-12)[:, None]
    C0 = jnp.maximum(C0 - jnp.median(C0, axis=-1, keepdims=True), 0.0)
    st = state.replace(C=C0 * state.active[:, None],
                       C_raw=C0 * state.active[:, None],
                       S=jnp.zeros_like(C0))
    st = update_background(Y, st, params)
    Ysig = subtract_background(Y, st, params)
    return update_temporal(Ysig, st, params)


def fit_batches(batches: Sequence, params: Optional[CNMFEParams] = None,
                n_outer: int = 1, spatial_sync: bool = True,
                verbose: bool = False) -> Tuple[CNMFEState, List[CNMFEState]]:
    """Run batch-mode CNMF-E.

    ``batches``: sequence of (T_b, H, W) arrays (or a MovieStore's
    ``iter_blocks()``). Returns (state with concatenated traces, list of
    per-batch states).
    """
    params = params or CNMFEParams.preset_1p()
    batches = list(batches)
    assert batches, "no batches"

    # ---- batch 1: full pipeline ------------------------------------- #
    model = CNMFE(params)
    st0 = model.fit(batches[0], n_outer=n_outer, verbose=verbose)
    per_batch = [st0]

    # ---- later batches: inherit A, fit background + traces ----------- #
    for b, Yb in enumerate(batches[1:], start=2):
        Yb = jnp.asarray(Yb, jnp.float32)
        st_b = init_traces_given_A(Yb, st0, params)
        per_batch.append(st_b)
        if verbose:
            print(f"[batch {b}] traces fit ({int(st_b.n_active())} neurons)")

    # ---- spatial sync: cc-weighted average of per-batch A ------------ #
    if spatial_sync and len(per_batch) > 1:
        A_acc = None
        w_acc = None
        for st_b, Yb in zip(per_batch, batches):
            Ysig = subtract_background(jnp.asarray(Yb, jnp.float32), st_b,
                                       params)
            st_sp = update_spatial(Ysig, st_b, params)
            cc = jnp.sum(st_b.C ** 2, axis=-1)            # (K,)
            contrib = st_sp.A * cc[:, None, None]
            A_acc = contrib if A_acc is None else A_acc + contrib
            w_acc = cc if w_acc is None else w_acc + cc
        A_sync = A_acc / jnp.maximum(w_acc, 1e-12)[:, None, None]
        per_batch = [st.replace(A=A_sync) for st in per_batch]

    # ---- concatenate traces over time -------------------------------- #
    C = jnp.concatenate([st.C for st in per_batch], axis=-1)
    C_raw = jnp.concatenate([st.C_raw for st in per_batch], axis=-1)
    S = jnp.concatenate([st.S for st in per_batch], axis=-1)
    final = per_batch[0].replace(C=C, C_raw=C_raw, S=S,
                                 A=per_batch[0].A)
    return final, per_batch
