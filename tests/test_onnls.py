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
