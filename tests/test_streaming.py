import numpy as np
import jax.numpy as jnp
import pytest

from cnmf_e_tpu.config import (BackgroundParams, CNMFEParams, InitParams,
                               MergeParams)
from cnmf_e_tpu.io.store import distribute_movie
from cnmf_e_tpu.models.streaming import fit_streaming
from cnmf_e_tpu.utils.metrics import detection_f1, trace_corr
from cnmf_e_tpu.utils.simulate import simulate_movie


def test_prefetch_blocks_order_and_slicing(tmp_path, rng):
    """The one-block-ahead prefetcher yields every block in order, as
    device arrays, and its slicer path reproduces the strided host reads
    the ring-Bf fit depends on."""
    from cnmf_e_tpu.models.streaming import _prefetch_device_blocks
    Y = rng.standard_normal((70, 8, 12)).astype(np.float32)
    src = str(tmp_path / "m.npy")
    np.save(src, Y)
    store = distribute_movie(src, str(tmp_path / "s"), frames_per_block=16)

    got = list(_prefetch_device_blocks(store))
    fpb = store.frames_per_block
    assert [t0 for t0, _ in got] == \
        [i * fpb for i in range(store.n_blocks())]
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(b) for _, b in got]), Y)
    # sub-block splitting covers every frame exactly once, in order
    got3 = list(_prefetch_device_blocks(store, sub_blocks=3))
    assert [t0 for t0, _ in got3] == sorted(t0 for t0, _ in got3)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(b) for _, b in got3]), Y)

    stride = 5

    def slicer(t0, blk):
        off = (-t0) % stride
        return np.ascontiguousarray(blk[off::stride])

    got_s = np.concatenate([np.asarray(b) for _, b in
                            _prefetch_device_blocks(store, slicer=slicer)])
    np.testing.assert_array_equal(got_s, Y[::stride])


@pytest.mark.slow
def test_streaming_pipeline(tmp_path):
    gt = simulate_movie(seed=61, H=48, W=48, T=800, K=7, gSig=2.5,
                        sn=0.08, bg_strength=0.7, min_dist=12.0,
                        spike_rate=0.04)
    src = str(tmp_path / "m.npy")
    np.save(src, gt.Y)
    store = distribute_movie(src, str(tmp_path / "store"),
                             frames_per_block=200)

    params = CNMFEParams(
        init=InitParams(gSig=2.5, gSiz=8, min_corr=0.8, min_pnr=8.0,
                        max_neurons=32, seeds_per_round=16, max_rounds=5),
        background=BackgroundParams(model="ring", ring_radius=9),
        merge=MergeParams(dmin=4.0),
    )
    state = fit_streaming(store, params, n_outer=2,
                          init_budget_frames=400, verbose=True)
    n = int(state.n_active())
    assert state.C.shape[-1] == 800
    A_est = np.asarray(state.masked_A())[:n]
    f1 = detection_f1(A_est, gt.A)
    assert f1["recall"] >= 0.7, f1
    corrs = trace_corr(np.asarray(state.C)[:n], gt.C, f1["matches"])
    assert np.median(corrs) > 0.85, corrs


def test_streaming_gram_hals_matches_inmemory(rng):
    """The streamed temporal pass (blockwise U accumulation +
    hals_temporal_sweeps) equals the in-memory coordinate descent on the
    same Grams — overlapping neurons get the exact cross-term updates, not
    a diagonal projection."""
    from cnmf_e_tpu.ops.hals import hals_temporal_sweeps
    H = W = 24
    T = 300
    K = 3
    # heavily overlapping footprints
    yy, xx = np.mgrid[0:H, 0:W]
    centers = [(12, 10), (12, 14), (10, 12)]
    A = np.stack([np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 8.0)
                  for cy, cx in centers]).astype(np.float32)
    C_true = np.abs(rng.standard_normal((K, T))).astype(np.float32)
    Y = np.einsum("khw,kt->thw", A, C_true) + \
        0.02 * rng.standard_normal((T, H, W)).astype(np.float32)
    Yd = Y.reshape(T, -1).T.astype(np.float32)
    Ad = A.reshape(K, -1)

    # in-memory: one Gram matmul
    V = jnp.asarray(Ad @ Ad.T)
    aa = np.sum(Ad * Ad, axis=1)
    C0 = jnp.asarray(np.maximum((Ad @ Yd) / aa[:, None], 0.0))
    ref = hals_temporal_sweeps(jnp.asarray(Ad @ Yd), V, C0, n_iter=4)

    # streamed: accumulate U over 3 blocks
    U_parts = [jnp.asarray(Ad) @ jnp.asarray(Y[t0:t0 + 100]).reshape(100, -1).T
               for t0 in (0, 100, 200)]
    U_stream = jnp.concatenate(U_parts, axis=1)
    out = hals_temporal_sweeps(U_stream, V, C0, n_iter=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    # and the sweeps actually demix the overlap: corr to truth ~1
    for k in range(K):
        corr = np.corrcoef(np.asarray(out)[k], C_true[k])[0, 1]
        assert corr > 0.99, (k, corr)


def _late_firing_movie(seed=91, H=48, W=48, T=3000, K=8, late_k=3,
                       t_late=1500):
    """Movie where the last ``late_k`` neurons fire only after ``t_late``
    (the batch-mode residual-pick acceptance case,
    initComponents_batch.m:71-77)."""
    from cnmf_e_tpu.utils.simulate import (ar1_traces, gaussian_footprints,
                                           smooth_field, GroundTruth)
    rng_ = np.random.default_rng(seed)
    A, centers = gaussian_footprints(rng_, K, H, W, 2.5, min_dist=12.0)
    K = A.shape[0]
    C, S = ar1_traces(rng_, K, T, g=0.95, rate=0.04)
    S[-late_k:, :t_late] = 0.0
    C2 = np.zeros_like(C)
    for t in range(T):
        C2[:, t] = (C2[:, t - 1] * 0.95 if t else 0.0) + S[:, t]
    b0 = 1.0 * (0.5 + smooth_field(rng_, H, W, scale=max(H, W) / 2))
    prof = 0.7 * smooth_field(rng_, H, W, scale=max(H, W) / 3)
    drive = np.convolve(rng_.standard_normal(T),
                        np.exp(-np.arange(200) / 80.0), mode="same")
    drive /= np.abs(drive).max()
    Bf = drive[:, None, None] * prof[None]
    Y = (np.einsum("khw,kt->thw", A, C2) + b0[None] + Bf
         + 0.08 * rng_.standard_normal((T, H, W))).astype(np.float32)
    return GroundTruth(Y=Y, A=A.astype(np.float32),
                       C=C2.astype(np.float32), S=S.astype(np.float32),
                       b0=b0, Bf=Bf, centers=centers, g=0.95, sn=0.08)


@pytest.mark.slow
def test_late_firing_neurons_recovered_by_batches_and_streaming(tmp_path):
    """Neurons first active in the second half are recovered by both batch
    mode (per-batch residual picks + A-union) and streaming (decimated
    proxy init sees the whole session)."""
    from cnmf_e_tpu.models.batch import fit_batches
    gt = _late_firing_movie()
    params = CNMFEParams(
        init=InitParams(gSig=2.5, gSiz=8, min_corr=0.8, min_pnr=8.0,
                        max_neurons=32, seeds_per_round=16, max_rounds=5),
        background=BackgroundParams(model="ring", ring_radius=9),
        merge=MergeParams(dmin=4.0),
    )

    final, per_batch = fit_batches(
        [gt.Y[:1000], gt.Y[1000:2000], gt.Y[2000:]], params, verbose=True)
    n = int(final.n_active())
    A_est = np.asarray(final.masked_A())
    A_est = A_est[np.asarray(final.active)]
    f1 = detection_f1(A_est, gt.A)
    assert f1["f1"] >= 0.9, f1

    src = str(tmp_path / "m.npy")
    np.save(src, gt.Y)
    store = distribute_movie(src, str(tmp_path / "store"),
                             frames_per_block=500)
    st = fit_streaming(store, params, n_outer=2, init_budget_frames=1500,
                       verbose=True)
    A_est2 = np.asarray(st.masked_A())[np.asarray(st.active)]
    f1s = detection_f1(A_est2, gt.A)
    assert f1s["f1"] >= 0.9, f1s


@pytest.mark.slow
def test_streaming_from_simulated_store(tmp_path):
    """simulate_movie_store -> fit_streaming end-to-end (the scale-demo
    path at toy size): blocks synthesized directly into the store with
    AR state carried across blocks."""
    from cnmf_e_tpu.utils.simulate import simulate_movie_store

    store = simulate_movie_store(str(tmp_path / "store"), seed=3, H=48,
                                 W=48, T=750, K=7, gSig=2.5, sn=0.06,
                                 bg_strength=0.6, min_dist=12.0,
                                 spike_rate=0.04, frames_per_block=250,
                                 overwrite=True)
    gt = np.load(str(tmp_path / "store" / "ground_truth.npz"))
    params = CNMFEParams(
        init=InitParams(gSig=2.5, gSiz=8, min_corr=0.8, min_pnr=8.0,
                        max_neurons=32, seeds_per_round=16, max_rounds=5),
        background=BackgroundParams(model="ring", ring_radius=9),
        merge=MergeParams(dmin=4.0),
    )
    state = fit_streaming(store, params, n_outer=2,
                          init_budget_frames=400)
    n = int(state.n_active())
    A_est = np.asarray(state.masked_A())[:n]
    f1 = detection_f1(A_est, np.asarray(gt["A"], np.float32))
    assert f1["recall"] >= 0.7, f1


@pytest.mark.slow
def test_batch1_traces_survive_A_sync(tmp_path):
    """When later batches add neurons, the A-sync refit must keep batch
    1's full-pipeline trace quality instead of resetting every batch from
    a projection (reference keeps per-batch C and re-runs the temporal
    update, ``initComponents_batch.m:87-113``; VERDICT r2 weak #6)."""
    from cnmf_e_tpu.models.batch import fit_batches
    from cnmf_e_tpu.models.pipeline import CNMFE
    from cnmf_e_tpu.utils.metrics import trace_corr
    gt = _late_firing_movie()
    params = CNMFEParams(
        init=InitParams(gSig=2.5, gSiz=8, min_corr=0.8, min_pnr=8.0,
                        max_neurons=32, seeds_per_round=16, max_rounds=5),
        background=BackgroundParams(model="ring", ring_radius=9),
        merge=MergeParams(dmin=4.0),
    )
    T1 = 1000
    final, per_batch = fit_batches(
        [gt.Y[:T1], gt.Y[T1:2000], gt.Y[2000:]], params, verbose=True)

    # standalone in-memory fit of batch 1 = the quality bar
    st_solo = CNMFE(params).fit(jnp.asarray(gt.Y[:T1]))
    n_solo = int(st_solo.n_active())
    # later batches must actually have added neurons (the A-sync path
    # fired): the synced batch-1 state carries more slots than a
    # standalone batch-1 fit finds
    assert int(per_batch[0].n_active()) > n_solo
    f1_solo = detection_f1(np.asarray(st_solo.masked_A())[:n_solo], gt.A)
    solo_corr = np.median(trace_corr(np.asarray(st_solo.C_raw)[:n_solo],
                                     gt.C[:, :T1], f1_solo["matches"]))

    # batch-1 traces after the whole batch pipeline (incl. A-sync refit)
    st_b1 = per_batch[0]
    act = np.asarray(st_b1.active)
    A_b1 = np.asarray(st_b1.A)[act]
    C_b1 = np.asarray(st_b1.C_raw)[act]
    f1_b1 = detection_f1(A_b1, gt.A)
    b1_corr = np.median(trace_corr(C_b1, gt.C[:, :T1], f1_b1["matches"]))

    # no degradation vs the in-memory fit (small tolerance for the extra
    # background refresh the batch path runs)
    assert b1_corr >= solo_corr - 0.02, (b1_corr, solo_corr)
    assert b1_corr >= 0.9, b1_corr


def test_streaming_snapshot_resume_preserves_ar_order(tmp_path):
    """Snapshot -> resume round-trip: the resumed state carries the saved
    g (AR coefficients), neuron_sn, and AR ORDER — resuming an AR(2)
    configuration must not truncate g to one column (r4 advisor finding:
    a hard-coded p=1 in the resume path silently zeroed g2, breaking the
    merge decay gate for resumed runs)."""
    import dataclasses

    from cnmf_e_tpu.config import DeconvParams, TemporalParams

    gt = simulate_movie(seed=62, H=32, W=32, T=500, K=4, gSig=2.5,
                        sn=0.08, bg_strength=0.6, min_dist=11.0,
                        spike_rate=0.04)
    src = str(tmp_path / "m.npy")
    np.save(src, gt.Y)
    store = distribute_movie(src, str(tmp_path / "store"),
                             frames_per_block=250)
    params = CNMFEParams(
        init=InitParams(gSig=2.5, gSiz=8, min_corr=0.8, min_pnr=8.0,
                        max_neurons=16, seeds_per_round=8, max_rounds=3),
        background=BackgroundParams(model="ring", ring_radius=7),
        merge=MergeParams(dmin=4.0),
        temporal=TemporalParams(deconv=DeconvParams(model="ar2")),
    )
    snap = str(tmp_path / "snap.npz")
    state0 = fit_streaming(store, params, n_outer=1,
                           init_budget_frames=250, snapshot_path=snap)
    assert state0.g.shape[1] == 2

    z = np.load(snap)
    assert set(["A", "active", "g", "neuron_sn"]) <= set(z.files)
    assert z["g"].shape[1] == 2
    assert str(z["stage"]) == "iter0"
    assert "C" in z.files          # traces ride along for offline scoring

    # resume: AR order and per-neuron g/sn must survive the round-trip
    # (n_outer=0 returns the loaded state without another refinement
    # iteration, isolating the round-trip semantics from toy-scale QC)
    state1 = fit_streaming(store, params, n_outer=0,
                           init_budget_frames=250, snapshot_path=snap)
    assert state1.g.shape[1] == 2
    assert int(state1.n_active()) == int(np.asarray(z["active"]).sum())
    # the active slots' g coefficients round-trip exactly (compact()
    # permutes actives to the front)
    act = np.asarray(z["active"]).astype(bool)
    g_saved = np.sort(np.asarray(z["g"])[act], axis=0)
    g_resumed = np.sort(
        np.asarray(state1.g)[:act.sum()], axis=0)
    np.testing.assert_allclose(g_resumed, g_saved, rtol=1e-6)


def test_streaming_mesh_shard_count_invariant(tmp_path):
    """Out-of-core x mesh composition (BASELINE config 5 "patch-sharded
    across N>=2 hosts"): `fit_streaming(mesh=...)` streams every chunk
    into a (frame, patch)-sharded array and the per-block Gram
    accumulations run SPMD — the result must match the unsharded
    streaming fit (shard-count invariance, SURVEY section 2.9)."""
    import jax
    from jax.sharding import Mesh

    from cnmf_e_tpu.parallel.mesh import make_mesh

    gt = simulate_movie(seed=63, H=48, W=48, T=600, K=6, gSig=2.5,
                        sn=0.08, bg_strength=0.7, min_dist=12.0,
                        spike_rate=0.04)
    src = str(tmp_path / "m.npy")
    np.save(src, gt.Y)
    store = distribute_movie(src, str(tmp_path / "store"),
                             frames_per_block=200)
    params = CNMFEParams(
        init=InitParams(gSig=2.5, gSiz=8, min_corr=0.8, min_pnr=8.0,
                        max_neurons=16, seeds_per_round=8, max_rounds=4),
        background=BackgroundParams(model="ring", ring_radius=7),
        merge=MergeParams(dmin=4.0),
    )

    state_solo = fit_streaming(store, params, n_outer=2,
                               init_budget_frames=300)
    mesh = make_mesh(n_patch=4, n_frame=2)
    state_mesh = fit_streaming(store, params, n_outer=2,
                               init_budget_frames=300, mesh=mesh)

    n_solo = int(state_solo.n_active())
    n_mesh = int(state_mesh.n_active())
    assert n_mesh == n_solo, (n_mesh, n_solo)
    A_s = np.asarray(state_solo.masked_A())[:n_solo]
    A_m = np.asarray(state_mesh.masked_A())[:n_mesh]
    # same pipeline, different reduction orders: near-exact agreement
    np.testing.assert_allclose(A_m, A_s, atol=5e-4)
    C_s = np.asarray(state_solo.C)[:n_solo]
    C_m = np.asarray(state_mesh.C)[:n_mesh]
    atol = 5e-3 * max(np.abs(C_s).max(), 1.0)
    np.testing.assert_allclose(C_m, C_s, atol=atol)


def test_ring_bootstrap_single_iteration_traces(tmp_path):
    """Iteration 0's temporal pass must already subtract the ring
    background: with the strided bootstrap fit (BackgroundParams.
    ring_bootstrap), a SINGLE outer iteration yields traces of the same
    quality that previously needed two; without it the bootstrap pass
    only subtracts the mean image and background leakage drags the trace
    correlation down (the config-5 finding: corr 0.30 at n_outer=1)."""
    import dataclasses

    gt = simulate_movie(seed=91, H=48, W=48, T=800, K=7, gSig=2.5,
                        sn=0.08, bg_strength=0.9, min_dist=12.0,
                        spike_rate=0.04)
    src = str(tmp_path / "m.npy")
    np.save(src, gt.Y)
    store = distribute_movie(src, str(tmp_path / "store"),
                             frames_per_block=200)
    params = CNMFEParams(
        init=InitParams(gSig=2.5, gSiz=8, min_corr=0.8, min_pnr=8.0,
                        max_neurons=32, seeds_per_round=16, max_rounds=5),
        background=BackgroundParams(model="ring", ring_radius=9),
        merge=MergeParams(dmin=4.0),
    )
    st_boot = fit_streaming(store, params, n_outer=1,
                            init_budget_frames=400)
    p_raw = params.replace(background=dataclasses.replace(
        params.background, ring_bootstrap=False))
    st_raw = fit_streaming(store, p_raw, n_outer=1,
                           init_budget_frames=400)

    def med_corr(st):
        n = int(st.n_active())
        A = np.asarray(st.masked_A())[:n]
        f1 = detection_f1(A, gt.A)
        return float(np.median(trace_corr(
            np.asarray(st.C)[:n], gt.C, f1["matches"])))

    c_boot, c_raw = med_corr(st_boot), med_corr(st_raw)
    assert c_boot > 0.85, (c_boot, c_raw)
    assert c_boot >= c_raw - 0.02, (c_boot, c_raw)
