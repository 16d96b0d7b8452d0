"""The distributed model-update step (the framework's "training step").

One full CNMF-E iteration — ring-background subtraction, spatial HALS,
temporal HALS, batched OASIS deconvolution — as a single jitted SPMD program
over the (patch, frame) mesh:

  * the ring stencil partitions over 'patch' with automatic halo exchange
  * Gram contractions (Y C^T over frames, A^T Y over pixels) psum over the
    sharded axis — the exact version of the reference's energy-weighted
    cross-patch trace reduction (``update_temporal_parallel.m:264-280``)
  * deconvolution reshards traces K-over-'patch' (per-trace parallelism,
    SURVEY.md 2.9) and runs the vmapped OASIS while_loop per shard
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cnmf_e_tpu.config import DeconvParams
from cnmf_e_tpu.ops.hals import hals_spatial, hals_temporal
from cnmf_e_tpu.ops.noise import noise_psd
from cnmf_e_tpu.ops.oasis import foopsi_ar1
from cnmf_e_tpu.ops.ring import RingWeights, apply_ring


class StepState(NamedTuple):
    """Arrays carried through one model-update iteration."""
    A: jnp.ndarray        # (K, H, W)
    C: jnp.ndarray        # (K, T)
    C_raw: jnp.ndarray    # (K, T)
    S: jnp.ndarray        # (K, T)
    g: jnp.ndarray        # (K,)  AR(1) coefficient per neuron
    b0: jnp.ndarray       # (H, W)
    ring_w: jnp.ndarray   # (H*W, R)
    ring_w0: jnp.ndarray  # (H*W,)


def make_update_step(mesh: Optional[Mesh], H: int, W: int, T: int,
                     radius: int, n_hals: int = 2,
                     deconv: Optional[DeconvParams] = None,
                     smin: float = -3.0):
    """Build the jitted update step for a given mesh (None = single device).

    Returns step(Y, state) -> state. All shapes static; K must divide the
    'patch' axis size when a mesh is given (pad K_max accordingly).
    """

    def constraint(x, spec):
        if mesh is None:
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec))

    def step(Y: jnp.ndarray, st: StepState) -> StepState:
        Y = constraint(Y, P("frame", "patch", None))
        A = constraint(st.A, P(None, "patch", None))
        C = constraint(st.C, P(None, "frame"))

        # ---- background subtraction (ring stencil over 'patch') -------- #
        weights = RingWeights(w=st.ring_w, w0=st.ring_w0)
        X = Y - st.b0[None] - jnp.einsum("khw,kt->thw", A, C)
        if mesh is None:
            # single device: Pallas stencil kernel when tiling allows
            from cnmf_e_tpu.ops.pallas_ring import ring_apply_auto
            B = ring_apply_auto(weights, X, H, W, radius) + st.b0[None]
        else:
            # mesh: XLA shift form partitions with automatic halo exchange
            B = apply_ring(weights, X, H, W, radius) + st.b0[None]
        Ysig = Y - B

        # ---- factor updates (Gram psums over sharded axes) ------------- #
        K = A.shape[0]
        Yd = Ysig.reshape(T, H * W).T              # (d, T)
        Ad = A.reshape(K, H * W).T                 # (d, K)
        Ad = hals_spatial(Yd, Ad, C, n_iter=n_hals)
        A_new = Ad.T.reshape(K, H, W)
        A_new = constraint(A_new, P(None, "patch", None))

        C_raw, _ = hals_temporal(Yd, Ad, C, n_iter=n_hals)

        # baseline: mean of sub-median samples (HALS_temporal.m:79)
        med = jnp.median(C_raw, axis=-1, keepdims=True)
        below = C_raw < med
        base = jnp.sum(jnp.where(below, C_raw, 0.0), axis=-1) / \
            jnp.maximum(jnp.sum(below, axis=-1), 1)
        C_raw = C_raw - base[:, None]

        # ---- deconvolution: reshard K over 'patch' --------------------- #
        C_dec_in = constraint(C_raw, P("patch", None))
        sn = noise_psd(C_dec_in)
        res = foopsi_ar1(C_dec_in, st.g, smin=smin, sn=sn, optimize_b=False)
        C_new = constraint(res.c, P(None, "frame"))
        S_new = constraint(res.s, P(None, "frame"))
        C_raw_new = constraint(C_raw, P(None, "frame"))

        return StepState(A=A_new, C=C_new, C_raw=C_raw_new, S=S_new,
                         g=st.g, b0=st.b0, ring_w=st.ring_w,
                         ring_w0=st.ring_w0)

    # NOTE: no donate_argnums — buffer donation triggers pathological
    # recompiles/serialization on the axon-tunneled TPU platform
    return jax.jit(step)
