"""Overlap-graph coloring for order-free Gauss-Seidel HALS updates.

Reference: ``utilities/update_order.m:1-21`` — the reference partitions
neurons into independent sets (via approximate vertex cover on the
``A'*A > 0`` overlap graph) so ``update_temporal_components.m`` can update
each set simultaneously. This module is the TPU-native recast: a greedy
graph coloring computed ON DEVICE (a K-step ``fori_loop`` over small
vectors, so the neuron ordering lives inside the jitted update program),
plus per-block independence flags consumed by the fused Pallas HALS
kernel's free-block fast path (:mod:`cnmf_e_tpu.ops.pallas_hals`).

Two exactness facts make the colored update bitwise-identical to the
sequential sweep (``HALS_temporal.m:58-107`` order semantics):

* temporal factor: the coupling is V = A A^T, and disjoint footprints
  give V[i, j] = 0 EXACTLY (the Gram sums pixelwise products that are
  each exactly zero), so the sequential correction term vanishes.
* spatial factor: the update is per-pixel; with search-location masks
  (``determine_search_location.m``) a neuron only changes pixels inside
  its own mask, so rows with disjoint masks cannot interact even though
  their trace Gram V = C C^T is dense.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def overlap_adjacency(support: jnp.ndarray) -> jnp.ndarray:
    """Boolean overlap graph of row supports. ``support``: (K, d) — any
    nonneg array whose positive entries mark the support (footprints or
    search masks). Returns (K, K) bool with zero diagonal (the
    reference's ``F = (A'*A>0); F(diag)=0``, update_order.m:4-5)."""
    S = (support > 0).astype(jnp.float32)
    O = S @ S.T
    K = S.shape[0]
    return (O > 0) & ~jnp.eye(K, dtype=bool)


def greedy_color(adj: jnp.ndarray) -> jnp.ndarray:
    """Greedy sequential coloring of an undirected graph, on device.

    adj: (K, K) bool, symmetric, zero diagonal. Returns colors (K,)
    int32 in [0, max_degree]. K sequential steps of O(K) vector work —
    negligible against the movie-sized Grams it reorders."""
    K = adj.shape[0]

    def body(k, colors):
        nbr = adj[k]                                     # (K,) bool
        # mark colors used by (already-colored) neighbors; uncolored
        # rows carry the sentinel K and land in the spill slot
        slot = jnp.where(nbr, colors, K)
        used = jnp.zeros((K + 1,), bool).at[slot].set(True)
        c = jnp.argmin(used[:K]).astype(jnp.int32)       # first unused
        return colors.at[k].set(c)

    return jax.lax.fori_loop(0, K, body, jnp.full((K,), K, jnp.int32))


def color_order(adj: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Permutation putting same-color (pairwise non-overlapping) rows
    contiguous. Returns (order, inverse) index vectors; apply as
    ``X[order]`` before the sweeps and ``X[inverse]`` after."""
    colors = greedy_color(adj)
    order = jnp.argsort(colors, stable=True)
    inverse = jnp.argsort(order)
    return order, inverse


def block_free_flags(coupling: jnp.ndarray, block: int = 16,
                     gate: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-block independence flags for the Pallas free-block path.

    coupling: (K, K) — V (temporal Gram) or the mask-overlap Gram
    (spatial); a block is free iff every off-diagonal entry among its
    ACTIVE rows is exactly zero. gate: optional (K,) — rows with
    gate == 0 never update, so their couplings are ignored. Returns
    (ceil(K/block),) int32."""
    K = coupling.shape[0]
    nb = -(-K // block)
    Kp = nb * block
    C = jnp.abs(coupling)
    if gate is not None:
        g = gate.astype(C.dtype)
        C = C * g[:, None] * g[None, :]
    C = jnp.pad(C, ((0, Kp - K), (0, Kp - K)))
    idx = jnp.arange(Kp).reshape(nb, block)
    Bd = C[idx[:, :, None], idx[:, None, :]]             # (nb, B, B)
    off = Bd.sum((1, 2)) - jnp.trace(Bd, axis1=1, axis2=2)
    return (off == 0).astype(jnp.int32)
