import numpy as np
import jax
import jax.numpy as jnp

from cnmf_e_tpu.ops.mcmc import mcmc_spikes
from tests.oracles import ar1_trace


def test_mcmc_finds_spikes(rng):
    g = 0.9
    T = 400
    # few large, well-separated spikes
    s_true = np.zeros(T)
    spike_times = [50, 150, 260, 340]
    for t in spike_times:
        s_true[t] = 2.0
    c = np.zeros(T)
    for t in range(T):
        c[t] = (c[t - 1] * g if t else 0) + s_true[t]
    sn = 0.15
    y = c + 1.0 + sn * rng.standard_normal(T)

    res = mcmc_spikes(jnp.asarray(y[None], jnp.float32),
                      jnp.asarray([g], jnp.float32),
                      jnp.asarray([sn], jnp.float32),
                      key=jax.random.PRNGKey(3), n_iter=3000, n_burn=500)
    prob = np.asarray(res.spike_prob[0])
    assert int(res.n_accept[0]) > 50
    # posterior mass concentrates near true spike bins (+-2 bins)
    for t in spike_times:
        assert prob[max(t - 2, 0):t + 3].max() > 0.5, (t, prob[t-3:t+4])
    # and is low in empty regions
    quiet = np.ones(T, bool)
    for t in spike_times:
        quiet[max(t - 5, 0):t + 6] = False
    assert prob[quiet].mean() < 0.1
    # baseline recovered
    assert abs(float(res.b_mean[0]) - 1.0) < 0.2


def _auc(score, truth):
    """Rank AUC of score for binary truth, with +-1 bin tolerance:
    the score at each bin is max-pooled over its 3-bin neighborhood so a
    one-bin localization offset is not penalized (ties averaged)."""
    score = np.maximum(score, np.maximum(np.roll(score, 1),
                                         np.roll(score, -1)))
    order = np.argsort(score)
    ranks = np.empty(len(score))
    ranks[order] = np.arange(1, len(score) + 1)
    pos = truth > 0
    n_pos, n_neg = pos.sum(), (~pos).sum()
    return (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


def test_mcmc_auc_beats_foopsi(rng):
    """Posterior spike prob should rank true spike bins at least as well as
    the foopsi point estimate (VERDICT item 9 done-criterion)."""
    from cnmf_e_tpu.ops.oasis import foopsi_ar1
    from tests.oracles import ar1_trace

    g, sn, T = 0.9, 0.25, 600
    y, c, s_true = ar1_trace(rng, T, g=g, sn=sn, rate=0.02, amp=1.5)
    yj = jnp.asarray(y[None], jnp.float32)
    res = mcmc_spikes(yj, jnp.asarray([g], jnp.float32),
                      jnp.asarray([sn], jnp.float32),
                      key=jax.random.PRNGKey(7), n_iter=3000, n_burn=600)
    truth = s_true > 0
    prob = np.asarray(res.spike_prob[0])
    fp = foopsi_ar1(yj, jnp.asarray([g], jnp.float32), optimize_b=True)
    s_foopsi = np.asarray(fp.s[0])
    auc_mcmc = _auc(prob, truth)
    auc_foopsi = _auc(s_foopsi, truth)
    assert auc_mcmc > 0.9
    assert auc_mcmc >= auc_foopsi - 0.02, (auc_mcmc, auc_foopsi)


def test_mcmc_time_constant_recovery(rng):
    """sample_g MH moves should pull a mis-specified g toward the truth
    (cont_ca_sampler.m resamples time constants)."""
    g_true, sn, T = 0.92, 0.12, 800
    y, c, s_true = ar1_trace(rng, T, g=g_true, sn=sn, rate=0.015, amp=2.0)
    y = y + 0.5
    res = mcmc_spikes(jnp.asarray(y[None], jnp.float32),
                      jnp.asarray([0.75], jnp.float32),   # wrong init
                      jnp.asarray([sn], jnp.float32),
                      key=jax.random.PRNGKey(11), n_iter=4000, n_burn=1500,
                      sample_g=True)
    g_post = float(res.g_mean[0, 0])
    assert abs(g_post - g_true) < abs(0.75 - g_true) / 3, g_post
    assert abs(g_post - g_true) < 0.04, g_post


def test_mcmc_adaptive_converges(rng):
    from cnmf_e_tpu.ops.mcmc import mcmc_spikes_adaptive

    g, sn, T = 0.9, 0.15, 300
    y, c, s_true = ar1_trace(rng, T, g=g, sn=sn, rate=0.02, amp=2.0)
    res = mcmc_spikes_adaptive(jnp.asarray(y[None], jnp.float32),
                               jnp.asarray([g], jnp.float32),
                               jnp.asarray([sn], jnp.float32),
                               key=jax.random.PRNGKey(5), block=400,
                               max_blocks=8)
    # diagnostic reported and sane; spikes found
    assert np.isfinite(float(res.geweke_z[0]))
    prob = np.asarray(res.spike_prob[0])
    assert _auc(prob, s_true > 0) > 0.9


def test_mcmc_ar2_kernel(rng):
    """AR(2) traces: sampler runs with p=2 kernels and finds spikes."""
    from cnmf_e_tpu.ops.ar import exp2ar
    d, r = 0.9, 0.5
    g2 = np.asarray(exp2ar(jnp.asarray([d]), jnp.asarray([r])))[0]
    T = 400
    s_true = np.zeros(T)
    for t in [60, 170, 290]:
        s_true[t] = 2.0
    c = np.zeros(T)
    for t in range(T):
        c[t] = (g2[0] * c[t - 1] if t >= 1 else 0) + \
            (g2[1] * c[t - 2] if t >= 2 else 0) + s_true[t]
    sn = 0.15
    y = c + sn * rng.standard_normal(T)
    res = mcmc_spikes(jnp.asarray(y[None], jnp.float32),
                      jnp.asarray(g2[None], jnp.float32),
                      jnp.asarray([sn], jnp.float32),
                      key=jax.random.PRNGKey(13), n_iter=2500, n_burn=500,
                      sample_g=True)
    prob = np.asarray(res.spike_prob[0])
    for t in [60, 170, 290]:
        assert prob[t - 2:t + 3].max() > 0.5, (t, prob[t - 3:t + 4])


def test_mcmc_grid_time_bias_below_one_frame(rng):
    """Off-grid spikes (continuous time n + phi) register at bin n + 1 —
    the (1 - phi)-frame quantization documented in the module docstring
    (cont_ca_sampler.m samples continuous times; for AR(1)/fast-rise
    AR(2) kernels the offset is an exact likelihood degeneracy). Pins
    |timing error| < 1 frame and its (1 - phi) structure."""
    from cnmf_e_tpu.ops.ar import exp2ar

    D, R = 0.92, 0.4

    def h_cont(u):
        u = np.asarray(u, float)
        v = (D ** (u + 1) - R ** (u + 1)) / (D - R)
        return np.where(u >= 0, v, 0.0)

    T = 400
    sn = 0.12
    events = [(60, 0.25), (160, 0.5), (260, 0.75), (340, 0.5)]
    y = np.zeros(T)
    t = np.arange(T)
    for n0, phi in events:
        y += 2.0 * h_cont(t - n0 - phi)
    y = y + 0.5 + sn * rng.standard_normal(T)

    g2 = np.asarray(exp2ar(jnp.asarray(D), jnp.asarray(R)))
    res = mcmc_spikes(jnp.asarray(y[None], jnp.float32),
                      jnp.asarray(g2[None], jnp.float32),
                      jnp.asarray([sn], jnp.float32),
                      key=jax.random.PRNGKey(5), n_iter=2500, n_burn=500,
                      sample_g=False)
    sm = np.asarray(res.spike_mean[0])
    for n0, phi in events:
        w = sm[n0 - 3:n0 + 5]
        tt = np.arange(n0 - 3, n0 + 5)
        assert w.sum() > 0.3, (n0, w)
        t_est = float((w * tt).sum() / w.sum())
        err = t_est - (n0 + phi)
        assert abs(err) < 1.0, (n0, phi, err)
        # the (1 - phi) ceil-quantization structure, +-0.25 frame slack
        assert abs(err - (1.0 - phi)) < 0.25, (n0, phi, err)
