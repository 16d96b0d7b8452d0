"""Neuron merging.

Reference family (``@Sources2D/merge_neurons_dist_corr.m``,
``merge_high_corr.m``, ``quickMerge.m``): build a candidate graph from
pairwise statistics, cluster with connected components (the C++ MEX), refit
each cluster with a rank-1 alternating LS, re-deconvolve the merged trace.

Here: pairwise stats are computed on device (K x K matmuls), the tiny graph
clustering runs host-side through the C++ union-find, and cluster refits are
small dense LS solved host-side in numpy (clusters are 2-5 neurons).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from cnmf_e_tpu.config import CNMFEParams
from cnmf_e_tpu.models.state import CNMFEState
from cnmf_e_tpu.native import connected_components
from cnmf_e_tpu.ops.oasis import deconvolve


def _centers(A: np.ndarray) -> np.ndarray:
    """Centers of mass (K, 2) of footprints (K, H, W)."""
    K, H, W = A.shape
    yy, xx = np.mgrid[0:H, 0:W]
    mass = A.sum(axis=(1, 2)) + 1e-12
    cy = (A * yy).sum(axis=(1, 2)) / mass
    cx = (A * xx).sum(axis=(1, 2)) / mass
    return np.stack([cy, cx], axis=1)


def _corr_rows(X: np.ndarray) -> np.ndarray:
    Xc = X - X.mean(axis=1, keepdims=True)
    n = np.linalg.norm(Xc, axis=1) + 1e-12
    return (Xc @ Xc.T) / np.outer(n, n)


def _cosine_rows(X: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(X, axis=1) + 1e-12
    return (X @ X.T) / np.outer(n, n)


def decay_times(state: CNMFEState) -> np.ndarray:
    """Per-neuron decay time constant (frames) from the AR coefficients:
    tau_d = -1 / log(d) with d the dominant root (``ar2exp`` of the kernel
    pars, as in ``Sources2D.m:585-596``)."""
    g = np.asarray(state.g)
    if g.shape[1] == 1:
        d = np.clip(g[:, 0], 1e-4, 1 - 1e-6)
    else:
        g1, g2 = g[:, 0], g[:, 1]
        d = (g1 + np.sqrt(np.maximum(g1 * g1 + 4 * g2, 0.0))) / 2.0
        d = np.clip(d, 1e-4, 1 - 1e-6)
    return -1.0 / np.log(d)


def merge_candidates_dist_corr(state: CNMFEState, params: CNMFEParams
                               ) -> np.ndarray:
    """Adjacency for distance+correlation merging
    (``merge_neurons_dist_corr.m:54-82``), with the optional decay-time
    gate (``:74-81``: skip pairs whose decay constants differ by more than
    ``max_decay_diff`` frames)."""
    active = np.asarray(state.active)
    A = np.asarray(state.masked_A())
    C = np.asarray(state.C)
    ctr = _centers(A)
    dist = np.linalg.norm(ctr[:, None] - ctr[None], axis=-1)
    cc = _corr_rows(C)
    adj = (dist <= params.merge.dmin) & (cc >= params.merge.merge_thr)
    if params.merge.max_decay_diff is not None:
        tau = decay_times(state)
        adj &= (np.abs(tau[:, None] - tau[None, :])
                <= params.merge.max_decay_diff)
    adj &= np.outer(active, active)
    np.fill_diagonal(adj, False)
    return adj


def merge_candidates_high_corr(state: CNMFEState, params: CNMFEParams
                               ) -> np.ndarray:
    """Adjacency for the (A overlap, C corr, S corr) triple threshold
    (``merge_high_corr.m:50-83`` / ``quickMerge.m:34-60``)."""
    a_thr, c_thr, s_thr = params.merge.merge_thr_spatial
    active = np.asarray(state.active)
    K = len(active)
    A = np.asarray(state.masked_A()).reshape(K, -1)
    C_raw = np.asarray(state.C_raw)
    S = np.asarray(state.S)
    adj = np.ones((K, K), bool)
    if a_thr > 0:
        adj &= _cosine_rows(A) >= a_thr
    if c_thr > 0:
        adj &= _corr_rows(C_raw) >= c_thr
    if s_thr > 0:
        # S from thresholded diff of C_raw when spikes absent
        Suse = S if S.any() else np.maximum(np.diff(C_raw, axis=1,
                                                    prepend=0.0), 0.0)
        adj &= _corr_rows(Suse) >= s_thr
    adj &= np.outer(active, active)
    np.fill_diagonal(adj, False)
    return adj


def merge_candidates_dist_only(state: CNMFEState, params: CNMFEParams
                               ) -> np.ndarray:
    """Distance-only adjacency (reference ``merge_close_neighbors.m`` /
    ``MergeNeighbors.m`` with dmin_only): any two active neurons whose
    centers are within ``dmin_only`` merge unconditionally."""
    active = np.asarray(state.active)
    ctr = _centers(np.asarray(state.masked_A()))
    dist = np.linalg.norm(ctr[:, None] - ctr[None], axis=-1)
    adj = dist <= params.merge.dmin_only
    adj &= np.outer(active, active)
    np.fill_diagonal(adj, False)
    return adj


def merge_pairs(state: CNMFEState, params: CNMFEParams,
                pairs) -> Tuple[CNMFEState, int]:
    """Manually merge the given (i, j) index pairs (reference:
    ``manual_merge`` / ``manual_merge_multi_pairs``) — the automated
    framework's replacement for the interactive flows."""
    K = state.K_max
    adj = np.zeros((K, K), bool)
    for i, j in pairs:
        adj[i, j] = adj[j, i] = True
    return _merge_with_adjacency(state, params, adj)


def merge_neurons(state: CNMFEState, params: CNMFEParams,
                  mode: str = "dist_corr") -> Tuple[CNMFEState, int]:
    """Cluster candidates and merge each cluster by rank-1 refit.

    Returns (new_state, n_merged_clusters). The merged component lands in
    the slot of the cluster's highest-energy member; other members
    deactivate (fixed-capacity slot semantics).
    """
    if mode == "dist_corr":
        adj = merge_candidates_dist_corr(state, params)
    elif mode == "dist_only":
        adj = merge_candidates_dist_only(state, params)
    else:
        adj = merge_candidates_high_corr(state, params)
    return _merge_with_adjacency(state, params, adj)


def _merge_with_adjacency(state: CNMFEState, params: CNMFEParams,
                          adj: np.ndarray) -> Tuple[CNMFEState, int]:
    if not adj.any():
        return state, 0

    labels, ncomp = connected_components(adj)
    active = np.array(state.active)      # mutable host copies
    A = np.array(state.A)
    C = np.array(state.C)
    C_raw = np.array(state.C_raw)
    K, H, W = A.shape
    T = C.shape[1]

    merged_traces = []
    merged_slots = []
    n_merged = 0
    for comp in range(ncomp):
        ids = np.nonzero((labels == comp) & active)[0]
        if len(ids) < 2:
            continue
        # skip clusters that are not actually connected (singleton labels
        # cover all nodes); require at least one edge inside
        if not adj[np.ix_(ids, ids)].any():
            continue
        n_merged += 1
        # rank-1 refit of sum_i a_i c_raw_i on the union support
        # (merge_neurons_dist_corr.m:180-187, 10 alternating LS steps)
        A_cl = A[ids].reshape(len(ids), -1)           # (m, d)
        C_cl = C_raw[ids]                             # (m, T)
        energy = (A_cl**2).sum(axis=1) * (C_cl**2).sum(axis=1)
        keep = ids[int(np.argmax(energy))]
        a = A_cl.sum(axis=0)
        c = C_cl[int(np.argmax(energy))].copy()
        # X @ c / c.c etc. without materializing X = A_cl^T C_cl (d x T):
        for _ in range(params.merge.refit_iters):
            # a = X c^T / (c c^T),  X = A_cl^T @ C_cl
            Cc = C_cl @ c                             # (m,)
            a = np.maximum(A_cl.T @ Cc / max(c @ c, 1e-12), 0.0)
            Ca = A_cl @ a                             # (m,)
            c = np.maximum(Ca @ C_cl / max(a @ a, 1e-12), 0.0)
        A[keep] = a.reshape(H, W)
        C_raw[keep] = c
        merged_traces.append(c)
        merged_slots.append(keep)
        for i in ids:
            if i != keep:
                active[i] = False
                A[i] = 0.0
                C[i] = 0.0
                C_raw[i] = 0.0

    if n_merged == 0:
        return state, 0

    state = state.replace(
        A=jnp.asarray(A), C=jnp.asarray(C), C_raw=jnp.asarray(C_raw),
        active=jnp.asarray(active),
        S=state.S * jnp.asarray(active)[:, None])

    # re-deconvolve the merged traces as one batch
    if params.temporal.deconv.enabled and merged_slots:
        slots = jnp.asarray(np.array(merged_slots))
        traces = jnp.asarray(np.stack(merged_traces)).astype(state.C.dtype)
        res = deconvolve(traces, params.temporal.deconv)
        state = state.replace(
            C=state.C.at[slots].set(res.c),
            C_raw=state.C_raw.at[slots].set(traces - res.b[:, None]),
            S=state.S.at[slots].set(res.s),
            g=state.g.at[slots].set(res.g[:, :state.g.shape[1]]))
    else:
        slots = jnp.asarray(np.array(merged_slots))
        traces = jnp.asarray(np.stack(merged_traces)).astype(state.C.dtype)
        state = state.replace(C=state.C.at[slots].set(traces))
    return state, n_merged
