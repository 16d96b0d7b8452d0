import numpy as np
import jax.numpy as jnp

from cnmf_e_tpu.ops.lowrank import fit_lowrank_model, nmf_hals, randomized_svd
from cnmf_e_tpu.ops.ring import (apply_ring, fit_ring_model, fit_ring_weights,
                                 reconstruct_ring_background, ring_offsets)
from cnmf_e_tpu.utils.simulate import simulate_movie


def test_ring_offsets_geometry():
    off = ring_offsets(5)
    r = np.sqrt((off**2).sum(axis=1))
    assert np.all(r >= 5) and np.all(r < 6)
    assert len(off) >= 16


def test_fit_ring_weights_recovers_planted_weights(rng):
    """Pixels generated as a known ring combination must be recovered."""
    H = W = 24
    radius = 4
    T = 600
    off = ring_offsets(radius)
    R = len(off)
    # latent smooth field driving all pixels
    base = rng.standard_normal((T, H + 2 * radius + 2, W + 2 * radius + 2))
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(base, sigma=(0, 3, 3)).astype(np.float32) * 10
    inner = base[:, radius + 1:radius + 1 + H, radius + 1:radius + 1 + W]
    Bf = inner - inner.mean(axis=0, keepdims=True)

    weights = fit_ring_weights(jnp.asarray(Bf), H, W, radius)
    pred = apply_ring(weights, jnp.asarray(Bf), H, W, radius)
    pred, Bfc = np.asarray(pred), Bf
    # smooth field: ring neighbors predict the center well away from borders
    err = pred[:, 6:-6, 6:-6] - Bfc[:, 6:-6, 6:-6]
    rel = np.linalg.norm(err) / np.linalg.norm(Bfc[:, 6:-6, 6:-6])
    assert rel < 0.25, rel


def test_ring_background_on_synthetic_movie():
    gt = simulate_movie(seed=3, H=40, W=40, T=400, K=5, sn=0.05,
                        bg_strength=1.0)
    Y = jnp.asarray(gt.Y)
    A = jnp.asarray(gt.A)
    C = jnp.asarray(gt.C)
    weights, b0, _ = fit_ring_model(Y, A, C, radius=8)
    B = reconstruct_ring_background(weights, Y, A, C, b0, radius=8)
    B = np.asarray(B)
    true_B = gt.Bf + gt.b0[None]
    # background estimate must beat the static-mean baseline
    err_ring = np.mean((B - true_B) ** 2)
    err_static = np.mean((true_B.mean(axis=0, keepdims=True) - true_B) ** 2)
    assert err_ring < 0.5 * err_static, (err_ring, err_static)


def test_randomized_svd_matches_exact(rng):
    X = rng.standard_normal((200, 80)).astype(np.float32)
    X = X @ np.diag(np.exp(-np.arange(80) / 5.0)) @ rng.standard_normal(
        (80, 80)).astype(np.float32)
    U, s, Vt = randomized_svd(jnp.asarray(X), 10)
    s_true = np.linalg.svd(X, compute_uv=False)[:10]
    np.testing.assert_allclose(np.asarray(s), s_true, rtol=1e-3)
    recon = np.asarray(U) @ np.diag(np.asarray(s)) @ np.asarray(Vt)
    recon_true = (np.linalg.svd(X)[0][:, :10] * s_true) @ np.linalg.svd(X)[2][:10]
    np.testing.assert_allclose(np.linalg.norm(X - recon),
                               np.linalg.norm(X - recon_true), rtol=1e-2)


def test_nmf_hals_reconstructs(rng):
    Wt = np.abs(rng.standard_normal((60, 3))).astype(np.float32)
    Ht = np.abs(rng.standard_normal((3, 90))).astype(np.float32)
    X = Wt @ Ht
    Wf, Hf = nmf_hals(jnp.asarray(X), 3, n_iter=200)
    recon = np.asarray(Wf) @ np.asarray(Hf)
    rel = np.linalg.norm(X - recon) / np.linalg.norm(X)
    assert rel < 0.02, rel


def test_fit_lowrank_model_svd():
    gt = simulate_movie(seed=4, H=32, W=32, T=300, K=4, sn=0.05,
                        bg_strength=1.0)
    b, f, b0 = fit_lowrank_model(jnp.asarray(gt.Y), jnp.asarray(gt.A),
                                 jnp.asarray(gt.C), rank=3, mode="svd")
    B = np.einsum("rhw,rt->thw", np.asarray(b), np.asarray(f)) + np.asarray(b0)
    true_B = gt.Bf + gt.b0[None]
    err = np.mean((B - true_B) ** 2)
    err_static = np.mean((true_B.mean(axis=0, keepdims=True) - true_B) ** 2)
    assert err < 0.3 * err_static


def test_fit_ring_weights_masked_no_intercept_oracle(rng):
    """Masked, intercept-free ring fit matches a per-pixel numpy ridge
    solved only over that pixel's unmasked frames
    (local_background.m:113-127 semantics)."""
    from cnmf_e_tpu.ops.ring import ring_offsets, _neighbor_index

    H = W = 10
    T = 60
    radius = 2
    Bf = rng.standard_normal((T, H, W)).astype(np.float32)
    mask = (rng.random((T, H, W)) > 0.3)

    weights = fit_ring_weights(jnp.asarray(Bf), H, W, radius,
                               ridge_eps=1e-5,
                               mask=jnp.asarray(mask), intercept=False)
    assert np.allclose(np.asarray(weights.w0), 0.0)

    offs = ring_offsets(radius)
    idx, valid = _neighbor_index(H, W, offs)
    m = int(np.abs(offs).max())
    Bp = np.pad(Bf, ((0, 0), (m, m), (m, m))).reshape(T, -1)
    Bflat = Bf.reshape(T, -1)
    mflat = mask.reshape(T, -1)
    for p in [0, 17, 55, 99]:
        X = Bp[:, idx[p]] * valid[p]                 # (T, R)
        sel = mflat[:, p]
        Xs, ys = X[sel].astype(np.float64), Bflat[sel, p].astype(np.float64)
        G = Xs.T @ Xs
        reg = 1e-5 * np.trace(G) * np.eye(G.shape[0])
        w_ref = np.linalg.solve(G + reg, Xs.T @ ys)
        w_got = np.asarray(weights.w[p], np.float64)
        assert np.allclose(w_got[valid[p]], w_ref[valid[p]], atol=5e-3), p


def test_local_background_event_masked():
    """local_background recovers a smooth background under sparse calcium
    transients; the event mask must reduce neuron contamination vs. a fit
    with the mask disabled (thresh=inf)."""
    from cnmf_e_tpu.ops.ring import local_background

    gt = simulate_movie(seed=5, H=48, W=48, T=300, K=6, gSig=2.0,
                        sn=0.05, bg_strength=1.5, min_dist=10.0,
                        spike_rate=0.03)
    Y = jnp.asarray(gt.Y)
    B_true = np.asarray(gt.B) if hasattr(gt, "B") else None

    Yest, wts, b0 = local_background(Y, radius=8, thresh=3.0)
    Yest_nomask, _, _ = local_background(Y, radius=8, thresh=np.inf)

    AC = np.einsum("khw,kt->thw", np.asarray(gt.A), np.asarray(gt.C))
    resid = np.asarray(Yest) - (np.asarray(gt.Y) - AC)
    resid_nomask = np.asarray(Yest_nomask) - (np.asarray(gt.Y) - AC)
    # neuron-pixel contamination: correlation of the estimate with the
    # neuron signal should be smaller with the event mask
    npx = AC.std(axis=0) > 0.05
    leak = float(np.mean(np.abs(
        [np.corrcoef(np.asarray(Yest)[:, i, j], AC[:, i, j])[0, 1]
         for i, j in zip(*np.where(npx))])))
    leak_nomask = float(np.mean(np.abs(
        [np.corrcoef(np.asarray(Yest_nomask)[:, i, j], AC[:, i, j])[0, 1]
         for i, j in zip(*np.where(npx))])))
    assert leak <= leak_nomask + 1e-6, (leak, leak_nomask)
    # background reconstruction error is small relative to bg scale
    bg_true = np.asarray(gt.Y) - AC
    err = float(np.sqrt(np.mean(resid ** 2)))
    scale = float(bg_true.std())
    assert err < 0.35 * scale, (err, scale)


def test_local_background_ssub_and_cutoff():
    from cnmf_e_tpu.ops.ring import local_background

    gt = simulate_movie(seed=6, H=40, W=40, T=200, K=4, gSig=2.0,
                        sn=0.05, bg_strength=1.0, min_dist=10.0)
    Y = jnp.asarray(gt.Y)
    Yest, wts, b0 = local_background(Y, radius=8, ssub=2,
                                     neighbor_cutoff=0.8)
    assert Yest.shape == Y.shape
    assert np.isfinite(np.asarray(Yest)).all()
    # DC restored: temporal mean of estimate matches movie mean closely
    assert float(np.abs(np.asarray(jnp.mean(Yest, 0) - jnp.mean(Y, 0))
                        ).mean()) < 0.05


def test_background_local_model_dispatch():
    """model='local' flows through update_background / background_of."""
    import dataclasses
    from cnmf_e_tpu.config import CNMFEParams
    from cnmf_e_tpu.models.background import background_of, update_background
    from cnmf_e_tpu.models.state import empty_state

    gt = simulate_movie(seed=9, H=32, W=32, T=150, K=3, gSig=2.0,
                        sn=0.05, bg_strength=1.0, min_dist=9.0)
    params = CNMFEParams.preset_1p()
    params = params.replace(background=dataclasses.replace(
        params.background, model="local", ring_radius=7))
    st = empty_state(K_max=8, H=32, W=32, T=150)
    Y = jnp.asarray(gt.Y)
    st2 = update_background(Y, st, params)
    assert st2.W is not None and np.isfinite(np.asarray(st2.b0)).all()
    B = background_of(Y, st2, params)
    assert B.shape == Y.shape
    AC = np.einsum("khw,kt->thw", np.asarray(gt.A), np.asarray(gt.C))
    bg_true = np.asarray(gt.Y) - AC
    err = float(np.sqrt(np.mean((np.asarray(B) - bg_true) ** 2)))
    assert err < 0.4 * float(bg_true.std()), err
