import numpy as np
import jax.numpy as jnp

from cnmf_e_tpu.config import DeconvParams
from cnmf_e_tpu.ops.ar import ar_kernel
from cnmf_e_tpu.ops.oasis import deconvolve
from cnmf_e_tpu.ops.onnls import onnls


def _ar2_trace(rng, T, d, r, rate=0.02, sn=0.1):
    s = (rng.random(T) < rate) * (1.0 + rng.random(T))
    g1, g2 = d + r, -d * r
    c = np.zeros(T)
    for t in range(T):
        c[t] = g1 * (c[t - 1] if t >= 1 else 0) \
            + g2 * (c[t - 2] if t >= 2 else 0) + s[t]
    return c + sn * rng.standard_normal(T), c, s


def test_onnls_noiseless_recovery(rng):
    d, r = 0.9, 0.5
    y, c_true, s_true = _ar2_trace(rng, 600, d, r, sn=0.0)
    c, s = onnls(jnp.asarray(y[None], jnp.float32),
                 jnp.asarray([d]), jnp.asarray([r]), fista_iters=200)
    c = np.asarray(c[0])
    rel = np.linalg.norm(c - c_true) / np.linalg.norm(c_true)
    assert rel < 0.05, rel
    # spikes land on (or adjacent to) true spike bins
    s_np = np.asarray(s[0])
    for t in np.nonzero(s_true)[0]:
        assert s_np[max(t - 1, 0):t + 2].sum() > 0.3 * s_true[t], t


def test_onnls_noisy_correlation(rng):
    d, r = 0.88, 0.4
    y, c_true, _ = _ar2_trace(rng, 800, d, r, sn=0.15, rate=0.03)
    c, s = onnls(jnp.asarray(y[None], jnp.float32),
                 jnp.asarray([d]), jnp.asarray([r]))
    corr = np.corrcoef(np.asarray(c[0]), c_true)[0, 1]
    assert corr > 0.93, corr


def test_deconvolve_ar2_dispatch(rng):
    d, r = 0.9, 0.45
    ys = np.stack([_ar2_trace(rng, 500, d, r, sn=0.1, rate=0.03)[0]
                   for _ in range(3)])
    cs = np.stack([_ar2_trace(rng, 500, d, r, sn=0.1, rate=0.03)[1]
                   for _ in range(3)])
    out = deconvolve(jnp.asarray(ys, jnp.float32),
                     DeconvParams(model="ar2", method="foopsi", smin=0.0,
                                  optimize_b=False))
    assert out.c.shape == ys.shape
    assert np.all(np.isfinite(np.asarray(out.c)))

def test_deconvolve_kernel_model(rng):
    from cnmf_e_tpu.ops.ar import ar_kernel
    d, r = 0.9, 0.45
    y, c_true, _ = _ar2_trace(rng, 500, d, r, sn=0.1, rate=0.03)
    # hand the true impulse response as an arbitrary kernel vector
    h = np.asarray(ar_kernel(jnp.asarray([d + r, -d * r]), 150))
    out = deconvolve(jnp.asarray(y[None], jnp.float32),
                     DeconvParams(model="kernel", method="foopsi",
                                  smin=0.0, optimize_b=False),
                     g=jnp.asarray(h))
    corr = np.corrcoef(np.asarray(out.c[0]), c_true)[0, 1]
    assert corr > 0.9, corr


def test_onnls_kernel_non_exponential_recovery(rng):
    """A gamma-shaped kernel no difference-of-exponentials matches well:
    the exact arbitrary-kernel solver must still recover the spikes."""
    from cnmf_e_tpu.ops.onnls import causal_conv, onnls_kernel
    T, Lh = 600, 60
    t = np.arange(Lh, dtype=np.float64)
    h = (t ** 2) * np.exp(-t / 6.0)          # delayed-rise gamma shape
    h /= h.max()
    s_true = (rng.random(T) < 0.02) * (1.0 + rng.random(T))
    c_true = np.convolve(s_true, h)[:T]
    y = c_true + 0.05 * rng.standard_normal(T)
    c, s = onnls_kernel(jnp.asarray(y[None], jnp.float32),
                        jnp.asarray(h, jnp.float32), fista_iters=200)
    corr = np.corrcoef(np.asarray(c[0]), c_true)[0, 1]
    assert corr > 0.97, corr
    s_np = np.asarray(s[0])
    for tt in np.nonzero(s_true)[0]:
        assert s_np[max(tt - 2, 0):tt + 3].sum() > 0.3 * s_true[tt], tt


def test_onnls_kernel_window_stitching_matches_global(rng):
    """Committed-spike subtraction across windows: windowed solution on a
    long trace matches a single-window (win >= T) solve."""
    from cnmf_e_tpu.ops.onnls import onnls_kernel
    T, Lh = 300, 40
    t = np.arange(Lh, dtype=np.float64)
    h = np.exp(-t / 8.0) - np.exp(-t / 2.0)
    h /= h.max()
    s_true = (rng.random(T) < 0.03) * (1.0 + rng.random(T))
    y = np.convolve(s_true, h)[:T] + 0.02 * rng.standard_normal(T)
    yj = jnp.asarray(y[None], jnp.float32)
    hj = jnp.asarray(h, jnp.float32)
    c_win, _ = onnls_kernel(yj, hj, win=100, shift=50, fista_iters=300)
    c_full, _ = onnls_kernel(yj, hj, win=T, shift=T, fista_iters=300)
    rel = np.linalg.norm(np.asarray(c_win - c_full)) / \
        np.linalg.norm(np.asarray(c_full))
    assert rel < 0.05, rel


def test_causal_conv_matches_numpy(rng):
    from cnmf_e_tpu.ops.onnls import causal_conv
    s = rng.random((2, 50)).astype(np.float32)
    h = rng.random(7).astype(np.float32)
    out = causal_conv(jnp.asarray(s), jnp.asarray(h))
    ref = np.stack([np.convolve(si, h)[:50] for si in s])
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_constrained_ar2_hits_noise_budget(rng):
    """Lambda bisection on the windowed solver reaches RSS = sn^2 T within
    a few percent (constrained_oasisAR2.m:1-60 semantics)."""
    from cnmf_e_tpu.ops.onnls import constrained_onnls
    d, r = 0.9, 0.45
    T = 600
    ys, sns = [], []
    for i in range(3):
        y, _, _ = _ar2_trace(rng, T, d, r, sn=0.12, rate=0.03)
        ys.append(y)
    ys = np.stack(ys).astype(np.float32)
    from cnmf_e_tpu.ops.noise import estimate_noise
    sn = estimate_noise(jnp.asarray(ys), "psd")
    c, s, b, lam = constrained_onnls(
        jnp.asarray(ys), jnp.full((3,), d, jnp.float32),
        jnp.full((3,), r, jnp.float32), sn, optimize_b=False, n_bisect=16)
    rss = np.sum((ys - np.asarray(c)) ** 2, axis=-1)
    target = np.asarray(sn) ** 2 * T
    rel = np.abs(rss - target) / target
    assert np.all(np.asarray(lam) > 0), lam
    assert np.all(rel < 0.05), (rss, target, rel)


def test_thresholded_ar2_approaches_noise_budget(rng):
    """smin bisection: RSS lands at/below the noise budget and spikes below
    the final floor are zero (thresholded_oasisAR2.m:79-140 semantics)."""
    from cnmf_e_tpu.ops.onnls import thresholded_onnls
    d, r = 0.9, 0.45
    T = 600
    y, _, _ = _ar2_trace(rng, T, d, r, sn=0.1, rate=0.04)
    y = y[None].astype(np.float32)
    from cnmf_e_tpu.ops.noise import estimate_noise
    sn = estimate_noise(jnp.asarray(y), "psd")
    c, s, b, smin = thresholded_onnls(
        jnp.asarray(y), jnp.asarray([d], jnp.float32),
        jnp.asarray([r], jnp.float32), sn, optimize_b=False)
    rss = float(np.sum((y - np.asarray(c)) ** 2))
    target = float(sn[0]) ** 2 * T
    assert rss <= target * 1.15, (rss, target)
    s_np = np.asarray(s[0])
    nz = s_np[s_np > 0]
    assert nz.size == 0 or nz.min() >= float(smin[0]) - 1e-5


def test_deconvolve_constrained_ar2_dispatch(rng):
    """deconvolve(model='ar2', method='constrained') runs the REAL lambda
    search (no silent lam=0 degradation)."""
    d, r = 0.88, 0.4
    ys = np.stack([_ar2_trace(rng, 400, d, r, sn=0.1, rate=0.03)[0]
                   for _ in range(2)]).astype(np.float32)
    out = deconvolve(jnp.asarray(ys),
                     DeconvParams(model="ar2", method="constrained",
                                  optimize_b=False))
    T = ys.shape[-1]
    from cnmf_e_tpu.ops.noise import estimate_noise
    sn = np.asarray(estimate_noise(jnp.asarray(ys), "psd"))
    rss = np.sum((ys - np.asarray(out.c)) ** 2, axis=-1)
    # the solution respects the noise budget (lambda search engaged)
    assert np.all(np.asarray(out.lam) >= 0)
    assert np.all(rss <= sn ** 2 * T * 1.1), (rss, sn ** 2 * T)


def test_optimize_exp2_recovers_kernel(rng):
    """Golden-section (d, r) search recovers the true kernel parameters
    from traces generated with a different initialization
    (update_kernel_exp2.m / update_tau.m role)."""
    from cnmf_e_tpu.ops.onnls import optimize_exp2
    d_true, r_true = 0.92, 0.35
    ys = np.stack([_ar2_trace(rng, 500, d_true, r_true, sn=0.05,
                              rate=0.03)[0] for _ in range(2)])
    d0 = jnp.full((2,), 0.8, jnp.float32)
    r0 = jnp.full((2,), 0.55, jnp.float32)
    d, r, c, s = optimize_exp2(jnp.asarray(ys, jnp.float32), d0, r0,
                               n_outer=2, n_golden=10)
    assert np.all(np.abs(np.asarray(d) - d_true) < 0.04), d
    assert np.all(np.abs(np.asarray(r) - r_true) < 0.12), r
