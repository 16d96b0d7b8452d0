"""MCEM deconvolution back-end (reference: utilities/MCEM_foopsi.m via
update_temporal_components.m:13,323-326 — the last member of the legacy
temporal method set {project, constrained_foopsi, MCEM, MCMC})."""

import numpy as np
import jax.numpy as jnp

from cnmf_e_tpu.config import DeconvParams
from cnmf_e_tpu.ops.oasis import deconvolve


def _ar1_traces(rng, N, T, g_true, sn, rate=0.03):
    S = (rng.random((N, T)) < rate) * rng.uniform(0.5, 1.5, (N, T))
    C = np.zeros((N, T))
    for t in range(T):
        C[:, t] = (C[:, t - 1] * g_true if t else 0) + S[:, t]
    return (C + sn * rng.standard_normal((N, T))).astype(np.float32), C, S


def test_mcem_ar1_improves_bad_g(rng):
    """Starting from a deliberately wrong decay constant, the MH
    time-constant walk + constrained refits recover the true tau and a
    cleaner trace than the frozen-g constrained fit."""
    g_true = 0.95
    y, C, _ = _ar1_traces(rng, 4, 500, g_true, sn=0.15)
    g_bad = jnp.full((4, 1), 0.7, jnp.float32)

    from cnmf_e_tpu.ops.mcem import mcem_foopsi
    p = DeconvParams(model="ar1", method="mcem", optimize_b=False)
    res = mcem_foopsi(jnp.asarray(y), p, g=g_bad, n_em=8)
    g_out = np.asarray(res.g)[:, 0]
    # the random-walk EM recovers most of the 0.25 starting error (the
    # reference's MaxIter=10 walk has the same reach)
    assert np.all(np.abs(g_out - g_true) < 0.1), g_out
    assert np.all(np.abs(g_out - g_true)
                  < 0.4 * abs(float(g_bad[0, 0]) - g_true)), g_out
    for k in range(4):
        cc = np.corrcoef(np.asarray(res.c)[k], C[k])[0, 1]
        assert cc > 0.9, (k, cc)


def test_mcem_ar2_runs_and_keeps_order(rng):
    """AR(2): rise < decay invariant holds and the result reconstructs."""
    from cnmf_e_tpu.ops.ar import ar2exp
    d_true, r_true = 0.9, 0.3
    g1, g2 = d_true + r_true, -d_true * r_true
    S = (rng.random((3, 400)) < 0.03) * rng.uniform(0.5, 1.5, (3, 400))
    C = np.zeros((3, 400))
    for t in range(400):
        C[:, t] = ((g1 * C[:, t - 1] if t >= 1 else 0)
                   + (g2 * C[:, t - 2] if t >= 2 else 0) + S[:, t])
    y = (C + 0.1 * rng.standard_normal((3, 400))).astype(np.float32)
    p = DeconvParams(model="ar2", method="mcem", optimize_b=False)
    res = deconvolve(jnp.asarray(y), p)
    d, r = ar2exp(res.g)
    assert np.all(np.asarray(d) > np.asarray(r)), (d, r)
    for k in range(3):
        cc = np.corrcoef(np.asarray(res.c)[k], C[k])[0, 1]
        assert cc > 0.85, (k, cc)
