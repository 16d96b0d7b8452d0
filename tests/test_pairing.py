"""pair_neurons / classify_components / update_order (models/pairing.py)."""

import numpy as np

from cnmf_e_tpu.models.pairing import (classify_components, pair_neurons,
                                       update_order)


def _footprints(centers, H=24, W=24, sig=1.5):
    yy, xx = np.mgrid[0:H, 0:W]
    A = np.stack([np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig ** 2))
                  for cy, cx in centers])
    return A.reshape(len(centers), -1).T          # (d, K)


def test_pair_neurons_recovers_permutation():
    rng = np.random.default_rng(0)
    centers = [(6, 6), (6, 17), (17, 6), (17, 17)]
    A1 = _footprints(centers)
    C1 = np.abs(rng.standard_normal((4, 200)))
    perm = np.array([2, 0, 3, 1])
    A2 = A1[:, perm] + 0.01 * rng.random(A1[:, perm].shape)
    C2 = C1[perm] + 0.01 * rng.standard_normal((4, 200))
    res = pair_neurons(A1, C1, A2, C2)
    # neuron k of result 1 sits at position perm^-1[k] in result 2
    inv = np.argsort(perm)
    np.testing.assert_array_equal(res.ind_max, inv)
    assert np.all(res.max_all[np.isfinite(res.max_all)] > 0.9)


def test_pair_neurons_unmatched_is_minus_one():
    rng = np.random.default_rng(1)
    A1 = _footprints([(6, 6), (17, 17)])
    C1 = np.abs(rng.standard_normal((2, 100)))
    A2 = _footprints([(6, 6)])
    C2 = C1[:1] + 0.01 * rng.standard_normal((1, 100))
    res = pair_neurons(A1, C1, A2, C2)
    assert res.ind_max[0] == 0
    # the spurious second neuron must not claim the only candidate
    assert (res.ind_max == 0).sum() == 1


def test_classify_components_energy_threshold():
    A = _footprints([(6, 6), (17, 17)])
    active = np.zeros(A.shape[0])
    act_img = active.reshape(24, 24)
    act_img[:12, :12] = 1.0           # covers neuron 0 only
    ff = classify_components(A, act_img.reshape(-1), cl_thr=0.8)
    assert ff[0] and not ff[1]


def test_update_order_groups_are_independent_and_complete():
    # two overlapping pairs + one isolated neuron
    A = _footprints([(6, 6), (7, 7), (17, 17), (18, 18), (6, 18)], sig=2.0)
    A[A < 1e-3] = 0.0
    groups = update_order(A)
    F = (A.T @ A) > 0
    np.fill_diagonal(F, False)
    seen = np.concatenate(groups)
    assert sorted(seen.tolist()) == list(range(5))
    for g in groups:
        for i in g:
            for j in g:
                if i != j:
                    assert not F[i, j]
    # reference orders largest group last
    assert len(groups[-1]) == max(len(g) for g in groups)


def _toy_state(K=6, H=24, W=24, T=120, seed=3):
    import jax.numpy as jnp
    from cnmf_e_tpu.models.state import empty_state
    rng = np.random.default_rng(seed)
    st = empty_state(K, H, W, T)
    A = np.zeros((K, H, W), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    centers = [(6, 6), (6, 18), (18, 6), (18, 18), (12, 12), (7, 7)]
    for k, (cy, cx) in enumerate(centers[:K]):
        A[k] = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 6.0)
    C = np.abs(rng.standard_normal((K, T))).astype(np.float32)
    g = np.linspace(0.7, 0.97, K).astype(np.float32)[:, None]
    return st.replace(A=jnp.asarray(A), C=jnp.asarray(C),
                      C_raw=jnp.asarray(C + 0.05 * rng.standard_normal(
                          (K, T)).astype(np.float32)),
                      S=jnp.asarray(np.maximum(np.diff(
                          C, axis=1, prepend=0.0), 0.0)),
                      g=jnp.asarray(g),
                      active=st.active.at[:].set(True))


def test_merge_decay_time_gate():
    """max_decay_diff excludes pairs with different decay constants
    (merge_neurons_dist_corr.m:74-81)."""
    import jax.numpy as jnp
    from cnmf_e_tpu.config import CNMFEParams, MergeParams
    from cnmf_e_tpu.models.merge import (decay_times,
                                         merge_candidates_dist_corr)
    st = _toy_state(K=2, T=200)
    # co-located, perfectly correlated traces, very different decay
    C = np.tile(np.sin(np.linspace(0, 20, 200)).astype(np.float32) + 1.5,
                (2, 1))
    st = st.replace(A=jnp.asarray(np.stack([np.asarray(st.A[0])] * 2)),
                    C=jnp.asarray(C),
                    g=jnp.asarray([[0.70], [0.97]], dtype=jnp.float32))
    p_open = CNMFEParams(merge=MergeParams(dmin=5.0, merge_thr=0.5))
    p_gated = CNMFEParams(merge=MergeParams(dmin=5.0, merge_thr=0.5,
                                            max_decay_diff=5.0))
    tau = decay_times(st)
    assert abs(tau[1] - tau[0]) > 5.0
    assert merge_candidates_dist_corr(st, p_open).any()
    assert not merge_candidates_dist_corr(st, p_gated).any()


def test_order_neurons_all_keys():
    """Every orderROIs key returns a valid permutation; directional keys
    order by the documented statistic (Sources2D.m:573-653)."""
    from cnmf_e_tpu.models.qc import apply_order, order_neurons
    st = _toy_state()
    K = st.K_max
    for key in ("snr", "pnr", "energy", "mean", "decay_time",
                "sparsity_spatial", "sparsity_temporal", "circularity",
                "temporal_cluster", "spatial_cluster"):
        perm = np.asarray(order_neurons(st, key))
        assert sorted(perm.tolist()) == list(range(K)), (key, perm)
    # decay_time sorts ascending in tau == ascending in g
    perm = np.asarray(order_neurons(st, "decay_time"))
    g = np.asarray(st.g[:, 0])
    assert np.all(np.diff(g[perm]) >= 0), g[perm]
    st2 = apply_order(st, perm)
    np.testing.assert_allclose(np.asarray(st2.g[:, 0]), np.sort(g))


def test_classify_wired_into_remove_false_positives():
    """With an active-pixel mask and classify_cl_thr set, components off
    the mask are removed by the QC pass."""
    import dataclasses
    import jax.numpy as jnp
    from cnmf_e_tpu.config import CNMFEParams, QCParams
    from cnmf_e_tpu.models.qc import remove_false_positives
    st = _toy_state(K=2, T=200)
    H, W = st.shape_hw
    # neuron 0 sits at (6, 6): mask covers it; neuron 1 at (6, 18): off-mask
    mask = np.zeros((H, W), bool)
    mask[:12, :12] = True
    # give both neurons clean QC stats so only classification differs
    t = np.arange(200)
    C = np.stack([np.maximum(np.sin(t / 5.0), 0) + 0.1] * 2).astype(np.float32)
    rng = np.random.default_rng(0)
    st = st.replace(C=jnp.asarray(C),
                    C_raw=jnp.asarray(C + 0.3 * rng.standard_normal(
                        (2, 200)).astype(np.float32)),
                    S=jnp.asarray(np.ones((2, 200), np.float32)))
    p = CNMFEParams(qc=QCParams(min_pixel=3, min_pnr=0.0,
                                classify_cl_thr=0.8))
    out = remove_false_positives(st, p, active_pixels=mask)
    act = np.asarray(out.active)
    assert act[0] and not act[1], act
