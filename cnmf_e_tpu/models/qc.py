"""Quality control: per-neuron defect tags and false-positive removal.

Reference: ``Sources2D.m:1683-1715`` (``tag_neurons_parallel`` bitmask:
1 = too few pixels, 2 = no spikes, 4 = zero-noise residual, 8 = low trace
PNR) and ``remove_false_positives`` (``Sources2D.m:744-759``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cnmf_e_tpu.config import CNMFEParams
from cnmf_e_tpu.models.state import CNMFEState
from cnmf_e_tpu.ops.noise import noise_psd

TAG_FEW_PIXELS = 1
TAG_NO_SPIKES = 2
TAG_ZERO_RESIDUAL = 4
TAG_LOW_PNR = 8


@functools.partial(jax.jit, static_argnames=("params",))
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


def remove_false_positives(state: CNMFEState, params: CNMFEParams,
                           active_pixels=None) -> CNMFEState:
    """Deactivate neurons with any defect tag (``Sources2D.m:744-759``).

    ``active_pixels``: optional (H, W) bool mask of signal-bearing pixels;
    when given (and ``qc.classify_cl_thr > 0``), components keeping less
    than ``cl_thr`` of their l2 norm on it are also dropped — the
    ``classify_components`` criterion (``classify_components.m:31-38``)
    wired into the QC pass.
    """
    if active_pixels is None or params.qc.classify_cl_thr <= 0:
        return _rfp_tags_only(state, params)
    import numpy as np
    from cnmf_e_tpu.models.pairing import classify_components
    state = tag_neurons(state, params)
    bad = (state.tags != 0) & state.active
    K = state.K_max
    keep_cl = classify_components(
        np.asarray(state.A).reshape(K, -1).T,
        np.asarray(active_pixels).reshape(-1),
        cl_thr=params.qc.classify_cl_thr)
    bad = bad | (jnp.asarray(~keep_cl) & state.active)
    return _apply_keep(state, state.active & ~bad)


@functools.partial(jax.jit, static_argnames=("params",))
def _rfp_tags_only(state: CNMFEState, params: CNMFEParams) -> CNMFEState:
    state = tag_neurons(state, params)
    keep = state.active & ~((state.tags != 0) & state.active)
    return _apply_keep(state, keep)


def _apply_keep(state: CNMFEState, keep: jnp.ndarray) -> CNMFEState:
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


def _circularity(A) -> "jnp.ndarray":
    """Per-neuron circularity statistic (``Sources2D.m:611-622``): rank-1
    row/column profiles of the footprint; ky/kx = widths above 0.3 max;
    key = |(kx - ky + 0.5) / (kx + ky)^2| (small = round). The reference
    uses nnmf(A_k, 1); footprints are nonnegative, so the column/row sums
    are proportional to the rank-1 factors."""
    import numpy as np
    A = np.asarray(A)
    w = A.sum(axis=2)                           # (K, H) row profile
    r = A.sum(axis=1)                           # (K, W) col profile
    ky = (w > 0.3 * w.max(axis=1, keepdims=True)).sum(axis=1)
    kx = (r > 0.3 * r.max(axis=1, keepdims=True)).sum(axis=1)
    denom = np.maximum((kx + ky) ** 2, 1)
    return jnp.asarray(np.abs((kx - ky + 0.5) / denom))


def _cluster_order(D: "np.ndarray", active: "np.ndarray") -> "jnp.ndarray":
    """Complete-linkage + optimal leaf ordering of a distance matrix
    (``Sources2D.m:623-637`` linkage/optimalleaforder role). Returns a
    permutation placing similar neurons adjacently, inactive slots last."""
    import numpy as np
    from scipy.cluster import hierarchy
    from scipy.spatial.distance import squareform
    idx = np.nonzero(active)[0]
    if idx.size < 3:
        return jnp.asarray(np.concatenate(
            [idx, np.nonzero(~active)[0]]).astype(np.int32))
    Ds = D[np.ix_(idx, idx)]
    Ds = np.maximum(Ds, 0.0)
    np.fill_diagonal(Ds, 0.0)
    dd = squareform((Ds + Ds.T) / 2.0, checks=False)
    tree = hierarchy.linkage(dd, method="complete")
    leaves = hierarchy.leaves_list(
        hierarchy.optimal_leaf_ordering(tree, dd))
    return jnp.asarray(np.concatenate(
        [idx[leaves], np.nonzero(~active)[0]]).astype(np.int32))


def order_neurons(state: CNMFEState, by: str = "snr") -> jnp.ndarray:
    """Sort permutation per neuron — the full ``orderROIs`` key family
    (``Sources2D.m:573-653``): snr, pnr, energy, mean, decay_time,
    sparsity_spatial, sparsity_temporal, circularity, temporal_cluster,
    spatial_cluster. Returns the permutation (host applies it via
    :func:`apply_order`); inactive slots sort last."""
    import numpy as np
    K = state.K_max
    A2 = state.A.reshape(K, -1)
    descend = True
    if by == "snr":
        resid = jnp.std(state.C_raw - state.C, axis=-1)
        key = jnp.var(state.C, axis=-1) / jnp.maximum(resid**2, 1e-12)
    elif by == "energy":
        key = jnp.sum(state.A**2, axis=(1, 2)) * jnp.sum(state.C**2, axis=-1)
    elif by == "pnr":
        # max(C) / std(C_raw - C) (Sources2D.m:620-622)
        resid = jnp.std(state.C_raw - state.C, axis=-1)
        key = jnp.max(state.C, axis=-1) / jnp.maximum(resid, 1e-12)
    elif by == "mean":
        # mean(C) * sum(A) (Sources2D.m:598-604, deconv branch)
        key = jnp.mean(state.C, axis=-1) * jnp.sum(A2, axis=-1)
    elif by == "decay_time":
        from cnmf_e_tpu.models.merge import decay_times
        key = jnp.asarray(decay_times(state))
        descend = False                      # reference sorts ascending
    elif by == "sparsity_spatial":
        key = jnp.sqrt(jnp.sum(A2**2, axis=-1)) / \
            jnp.maximum(jnp.sum(jnp.abs(A2), axis=-1), 1e-12)
        descend = False
    elif by == "sparsity_temporal":
        key = jnp.sqrt(jnp.sum(state.C_raw**2, axis=-1)) / \
            jnp.maximum(jnp.sum(jnp.abs(state.C_raw), axis=-1), 1e-12)
    elif by == "circularity":
        key = _circularity(state.A)
        descend = False
    elif by == "temporal_cluster":
        Cn = np.asarray(state.C_raw, np.float64)
        n = np.linalg.norm(Cn, axis=1) + 1e-12
        D = 1.0 - (Cn / n[:, None]) @ (Cn / n[:, None]).T
        return _cluster_order(D, np.asarray(state.active))
    elif by == "spatial_cluster":
        An = np.asarray(A2, np.float64)
        n = np.linalg.norm(An, axis=1) + 1e-12
        D = 1.0 - (An / n[:, None]) @ (An / n[:, None]).T
        return _cluster_order(D, np.asarray(state.active))
    else:
        raise ValueError(f"unknown order key {by!r}")
    key = jnp.where(state.active, key, jnp.inf if not descend else -jnp.inf)
    return jnp.argsort(-key if descend else key)


def apply_order(state: CNMFEState, perm) -> CNMFEState:
    """Permute all per-neuron arrays of the state by ``perm``
    (``orderROIs`` tail, ``Sources2D.m:641-652``)."""
    perm = jnp.asarray(perm, jnp.int32)
    return state.replace(
        A=state.A[perm], C=state.C[perm], C_raw=state.C_raw[perm],
        S=state.S[perm], g=state.g[perm],
        neuron_sn=state.neuron_sn[perm],
        active=state.active[perm],
        tags=None if state.tags is None else state.tags[perm])
