"""Botev diffusion KDE + mode baseline (reference utilities/kde.m)."""

import numpy as np

from cnmf_e_tpu.ops.kde import kde_botev, mode_baseline


def test_kde_gaussian_recovers_density():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4000)
    xmesh, dens, bw = kde_botev(x)
    # normalized: integrates to ~1
    area = np.trapezoid(dens, xmesh)
    assert abs(area - 1.0) < 0.05, area
    # peak near 0 with density ~ N(0,1) pdf at 0
    peak = xmesh[np.argmax(dens)]
    assert abs(peak) < 0.3, peak   # flat-top: peak location jitters ~bw
    assert abs(dens.max() - 0.3989) < 0.08, dens.max()
    assert 0.1 < bw < 0.6


def test_kde_bimodal_peaks():
    rng = np.random.default_rng(1)
    x = np.concatenate([rng.normal(-3, 0.4, 3000), rng.normal(3, 0.4, 3000)])
    xmesh, dens, _ = kde_botev(x)
    lo = dens[(xmesh > -1) & (xmesh < 1)].max()
    hi = min(dens[np.abs(xmesh + 3) < 0.5].max(),
             dens[np.abs(xmesh - 3) < 0.5].max())
    assert hi > 4 * lo   # two separated modes, valley between


def test_mode_baseline_ignores_transients():
    """Fluorescence = baseline + sparse positive transients: the mode sits
    at the baseline while mean/median are biased upward."""
    rng = np.random.default_rng(2)
    x = 5.0 + 0.2 * rng.standard_normal(6000)
    tr = rng.random(6000) < 0.15
    x[tr] += rng.exponential(2.0, tr.sum())
    m = mode_baseline(x)
    assert abs(m - 5.0) < 0.15, m
    assert np.mean(x) - 5.0 > 0.2   # mean IS biased — mode is the point


def test_mode_baseline_constant_input():
    assert abs(mode_baseline(np.full(100, 3.3)) - 3.3) < 0.6
