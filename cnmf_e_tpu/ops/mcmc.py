"""Bayesian spike inference by MCMC.

Reference: ``OASIS_matlab/packages/MCMC/cont_ca_sampler.m`` — continuous-time
Gibbs + HMC sampling of spike times with marginalized baseline/amplitude.

TPU re-design: discrete-time Metropolis-within-Gibbs over spike vectors,
fully vectorized across traces (and trivially across chains by stacking).
Each sweep proposes one move per trace — birth (add a spike at a random
bin), death (remove a random spike), or amplitude/baseline resample — and
accepts by the exact likelihood ratio computed from an O(L) local update of
the residual (adding ``a * h`` starting at bin t). All randomness comes from
``jax.random``; the whole sampler is one ``lax.scan`` under jit.

Model:  y = b + conv(s, h) + eps,  eps ~ N(0, sn^2),
        s_t ~ spike-and-slab: P(s_t > 0) = p_spike, amplitude ~ Exp(1/mu_a).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from cnmf_e_tpu.ops.ar import ar_kernel


class MCMCResult(NamedTuple):
    spike_prob: jnp.ndarray    # (..., T) posterior spike probability
    spike_mean: jnp.ndarray    # (..., T) posterior mean spike amplitude
    c_mean: jnp.ndarray        # (..., T) posterior mean denoised trace
    b_mean: jnp.ndarray        # (...,) posterior mean baseline
    n_accept: jnp.ndarray      # (...,) accepted moves (diagnostics)


@functools.partial(jax.jit,
                   static_argnames=("n_iter", "n_burn", "kernel_len"))
def mcmc_spikes(y: jnp.ndarray, g: jnp.ndarray, sn: jnp.ndarray,
                key: Optional[jax.Array] = None, n_iter: int = 400,
                n_burn: int = 100, p_spike: float = 0.01,
                mu_amp: Optional[jnp.ndarray] = None,
                kernel_len: int = 200) -> MCMCResult:
    """Sample spike trains. y: (N, T); g: (N,) or (N, p); sn: (N,)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    N, T = y.shape
    if g.ndim == 1:
        g = g[:, None]
    L = min(kernel_len, T)
    h = ar_kernel(g, L)                                    # (N, L)
    hh = jnp.sum(h * h, axis=-1)                           # (N,)
    if mu_amp is None:
        mu_amp = jnp.maximum(jnp.max(y, axis=-1) * 0.5, 1e-3)

    s0 = jnp.zeros((N, T), y.dtype)
    b0 = jnp.median(y, axis=-1)
    resid0 = y - b0[:, None]                               # y - b - conv(s,h)

    log_prior_on = jnp.log(p_spike / (1 - p_spike))
    inv_var = 1.0 / jnp.maximum(sn * sn, 1e-12)

    def conv_tail(t_idx):
        """(N, L) mask-safe window positions starting at t_idx (N,)."""
        return t_idx[:, None] + jnp.arange(L)[None, :]

    def delta_loglik(resid, amp, t_idx):
        """Change in log-likelihood from adding amp*h at bin t (per trace).

        dLL = -1/(2 sn^2) * (||r - a h||^2 - ||r||^2)
            = (a <r, h> - a^2 hh / 2) / sn^2   over the valid window.
        """
        pos = conv_tail(t_idx)                             # (N, L)
        valid = pos < T
        r_win = jnp.take_along_axis(resid, jnp.minimum(pos, T - 1), axis=1)
        r_win = jnp.where(valid, r_win, 0.0)
        hv = jnp.where(valid, h, 0.0)
        rh = jnp.sum(r_win * hv, axis=-1)
        hh_v = jnp.sum(hv * hv, axis=-1)
        return (amp * rh - 0.5 * amp * amp * hh_v) * inv_var, pos, valid

    def apply_spike(resid, amp, t_idx):
        pos = conv_tail(t_idx)
        valid = pos < T
        upd = jnp.where(valid, amp[:, None] * h, 0.0)
        return resid - jnp.zeros_like(resid).at[
            jnp.arange(N)[:, None], jnp.minimum(pos, T - 1)].add(upd)

    def sweep(carry, key):
        s, b, resid, acc = carry
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        move = jax.random.randint(k1, (N,), 0, 3)

        # ---- birth: propose spike at uniform bin with Exp amplitude ---- #
        t_prop = jax.random.randint(k2, (N,), 0, T)
        amp = jax.random.exponential(k3, (N,)) * mu_amp
        dll, _, _ = delta_loglik(resid, amp, t_prop)
        occupied = jnp.take_along_axis(s, t_prop[:, None], axis=1)[:, 0] > 0
        log_alpha_birth = dll + log_prior_on
        # ---- death: remove a random existing spike -------------------- #
        n_spk = jnp.sum(s > 0, axis=-1)
        # pick an existing spike index via weighted choice
        u = jax.random.uniform(k4, (N,))
        csum = jnp.cumsum((s > 0).astype(y.dtype), axis=-1)
        target = jnp.ceil(u * jnp.maximum(n_spk, 1)).astype(y.dtype)
        t_del = jnp.argmax((csum >= target[:, None]).astype(jnp.int8),
                           axis=-1)
        amp_del = jnp.take_along_axis(s, t_del[:, None], axis=1)[:, 0]
        dll_del, _, _ = delta_loglik(resid, -amp_del, t_del)
        log_alpha_death = dll_del - log_prior_on

        # ---- baseline resample (gibbs-like MH) ------------------------ #
        # resid = y - b - conv(s,h); raising b by db lowers resid by db
        # -> dLL = (db * sum(r) - T db^2 / 2) / sn^2
        b_prop = b + jax.random.normal(k5, (N,)) * sn * 0.5
        dll_b = (jnp.sum(resid, axis=-1) * (b_prop - b)
                 - 0.5 * T * (b_prop - b) ** 2) * inv_var

        logu = jnp.log(jax.random.uniform(jax.random.fold_in(key, 7), (N,))
                       + 1e-12)

        do_birth = (move == 0) & ~occupied & (logu < log_alpha_birth)
        do_death = (move == 1) & (n_spk > 0) & (logu < log_alpha_death)
        do_base = (move == 2) & (logu < dll_b)

        s = s.at[jnp.arange(N), t_prop].add(
            jnp.where(do_birth, amp, 0.0))
        resid = apply_spike(resid, jnp.where(do_birth, amp, 0.0), t_prop)
        s = s.at[jnp.arange(N), t_del].add(
            jnp.where(do_death, -amp_del, 0.0))
        resid = apply_spike(resid, jnp.where(do_death, -amp_del, 0.0),
                            t_del)
        db = jnp.where(do_base, b_prop - b, 0.0)
        b = b + db
        resid = resid - db[:, None]
        acc = acc + (do_birth | do_death | do_base).astype(jnp.int32)
        return (s, b, resid, acc), (s > 0, s, b)

    keys = jax.random.split(key, n_iter)
    (s, b, resid, acc), (on_hist, s_hist, b_hist) = jax.lax.scan(
        sweep, (s0, b0, resid0, jnp.zeros(N, jnp.int32)), keys)

    keep = slice(n_burn, None)
    spike_prob = jnp.mean(on_hist[keep].astype(y.dtype), axis=0)
    spike_mean = jnp.mean(s_hist[keep], axis=0)
    b_mean = jnp.mean(b_hist[keep], axis=0)
    # posterior mean denoised trace from the mean spikes
    c_mean = jax.vmap(lambda sv, hv: jnp.convolve(sv, hv, mode="full")[:T])(
        spike_mean, h)
    return MCMCResult(spike_prob=spike_prob, spike_mean=spike_mean,
                      c_mean=c_mean, b_mean=b_mean, n_accept=acc)
