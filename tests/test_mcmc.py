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
