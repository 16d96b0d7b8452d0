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
