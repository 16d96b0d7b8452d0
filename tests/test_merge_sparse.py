"""Sparse-activity merge regression: distinct close-by neurons whose
footprint TAILS are background-contaminated must survive merging at
default 1p params.

This pins the round-3 scale-recall failure mode (SCALE.md): at low spike
rates, traces of neighbors correlate through shared background residual
and footprints grow contaminated tails. A center-of-mass distance
(estCenter) gets dragged toward the shared contamination and passes the
``dmin`` gate for neurons whose true peaks are far apart; the reference
demos measure center distance at the footprint PEAK
(``merge_neurons_dist_corr.m:63-66``, ``demo_large_data_1p.m:60``
method_dist='max'), which is robust to tail contamination. The framework
default is therefore ``method_dist='max'``.
"""

import jax.numpy as jnp
import numpy as np

from cnmf_e_tpu.config import CNMFEParams, MergeParams
from cnmf_e_tpu.models.merge import (merge_candidates_dist_corr,
                                     merge_candidates_dist_only,
                                     merge_neurons, merge_neurons_seq)
from cnmf_e_tpu.models.state import empty_state


def _contaminated_pair(seed=0, H=28, W=28, T=2000, spike_rate=0.01):
    """Two true neurons, peaks 7 px apart, + shared broad contamination
    blob between them (dominates the footprint mass -> drags COM), +
    traces sharing a slow background component (corr > 0.65)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    centers = [(13, 10), (13, 17)]
    A = np.stack([
        np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 1.5 ** 2))
        for cy, cx in centers]).astype(np.float32)
    shared = 0.3 * np.exp(-((yy - 13.0) ** 2 + (xx - 13.5) ** 2)
                          / (2 * 6.0 ** 2))
    A = A + shared[None].astype(np.float32)

    # sparse independent spikes + strong shared slow drift (bg leak)
    g = 0.95
    C = np.zeros((2, T), np.float32)
    S = (rng.random((2, T)) < spike_rate).astype(np.float32)
    for t in range(1, T):
        C[:, t] = g * C[:, t - 1] + S[:, t]
    drift = np.convolve(rng.standard_normal(T),
                        np.exp(-np.arange(200) / 60.0), mode="same")
    drift = (drift / np.abs(drift).max()).astype(np.float32)
    C_raw = C + 2.0 * drift[None]       # both traces ride the same drift

    st = empty_state(2, H, W, T)
    st = st.replace(A=jnp.asarray(A), C=jnp.asarray(C_raw),
                    C_raw=jnp.asarray(C_raw), S=jnp.asarray(S),
                    g=jnp.full((2, 1), g, jnp.float32),
                    active=st.active.at[:].set(True))
    return st


def test_scenario_is_adversarial():
    """The construction really does produce correlated traces and
    COM-dragged centers (else the survival assertions are vacuous)."""
    st = _contaminated_pair()
    C = np.asarray(st.C)
    cc = np.corrcoef(C)[0, 1]
    assert cc >= 0.65, cc
    A = np.asarray(st.A)
    K, H, W = A.shape
    mass = A.sum((1, 2))
    com_x = (A * np.arange(W)[None, None, :]).sum((1, 2)) / mass
    pk = A.reshape(K, -1).argmax(1) % W
    assert abs(com_x[1] - com_x[0]) < 4.0     # COM passes the dmin gate
    assert abs(pk[1] - pk[0]) >= 7            # peaks do not


def test_sparse_neighbors_survive_default_merge():
    st = _contaminated_pair()
    params = CNMFEParams()                     # default 1p merge params
    assert params.merge.method_dist == "max"
    assert not merge_candidates_dist_corr(st, params).any()
    assert not merge_candidates_dist_only(st, params).any()
    out, nm = merge_neurons_seq(st, params, ("dist_corr", "dist_only"),
                                deconv=False)
    assert nm == 0
    assert int(np.asarray(out.active).sum()) == 2


def test_com_centers_would_have_merged():
    """Documents the failure mode the default avoids: with
    method_dist='mean' the same state merges into one neuron."""
    st = _contaminated_pair()
    params = CNMFEParams(merge=MergeParams(method_dist="mean"))
    assert merge_candidates_dist_corr(st, params).any()
    out, nm = merge_neurons(st, params, "dist_corr", deconv=False)
    assert nm == 1
    assert int(np.asarray(out.active).sum()) == 1
