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
