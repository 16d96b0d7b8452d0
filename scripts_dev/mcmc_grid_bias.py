import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp, jax
from cnmf_e_tpu.ops.mcmc import mcmc_spikes
from cnmf_e_tpu.ops.ar import exp2ar

D, R = 0.92, 0.4
def h_cont(u):
    u = np.asarray(u, float)
    v = (D ** (u + 1) - R ** (u + 1)) / (D - R)
    return np.where(u >= 0, v, 0.0)

rng = np.random.default_rng(0)
T = 500
sn = 0.12
events = [(60, 0.25), (140, 0.5), (220, 0.75), (300, 0.25), (380, 0.5), (455, 0.75)]
results = {0.25: [], 0.5: [], 0.75: []}
g2 = np.asarray(exp2ar(jnp.asarray(D), jnp.asarray(R)))
for trial in range(12):
    y = np.zeros(T)
    amps = rng.uniform(1.5, 2.5, len(events))
    for (n0, phi), a in zip(events, amps):
        t = np.arange(T)
        y += a * h_cont(t - n0 - phi)
    y = y + 0.5 + sn * rng.standard_normal(T)
    res = mcmc_spikes(jnp.asarray(y[None], jnp.float32),
                      jnp.asarray(g2[None], jnp.float32),
                      jnp.asarray([sn], jnp.float32),
                      key=jax.random.PRNGKey(trial), n_iter=3000,
                      n_burn=600, sample_g=False)
    sm = np.asarray(res.spike_mean[0])
    for (n0, phi), a in zip(events, amps):
        w = sm[n0 - 3:n0 + 5]
        tt = np.arange(n0 - 3, n0 + 5)
        if w.sum() < 0.1: continue
        t_est = (w * tt).sum() / w.sum()
        results[phi].append(t_est - (n0 + phi))
for phi in (0.25, 0.5, 0.75):
    e = np.array(results[phi])
    print(f"phi={phi}: n={e.size} bias={e.mean():+.3f} std={e.std():.3f} frames")
all_e = np.concatenate([np.array(v) for v in results.values()])
print(f"overall |bias| mean={np.abs(all_e).mean():.3f}, max={np.abs(all_e).max():.3f}")
