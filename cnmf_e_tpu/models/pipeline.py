"""End-to-end CNMF-E pipeline: the Sources2D-equivalent high-level API.

Stage order mirrors the canonical large-data demo
(``demos/demo_large_data_1p.m:122-232``):

  init -> merge -> background -> residual pick -> temporal -> QC ->
  merges -> spatial -> [background -> temporal -> spatial -> merges] x N

Every stage is a pure function over the immutable :class:`CNMFEState`;
the driver below is plain Python orchestrating jitted programs, so the same
code runs single-chip or on a ``(patch, frame)`` mesh (sharded inputs).
"""

from __future__ import annotations

import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from cnmf_e_tpu.config import CNMFEParams
from cnmf_e_tpu.models.background import (background_of, residual_movie,
                                          subtract_background,
                                          update_background)
from cnmf_e_tpu.models.dff import extract_dff
from cnmf_e_tpu.models.initialize import initialize_greedy
from cnmf_e_tpu.models.merge import merge_neurons
from cnmf_e_tpu.models.qc import remove_false_positives, tag_neurons
from cnmf_e_tpu.models.spatial import update_spatial
from cnmf_e_tpu.models.state import CNMFEState, compact
from cnmf_e_tpu.models.temporal import update_temporal
from cnmf_e_tpu.ops.noise import noise_psd_frames


class CNMFE:
    """High-level pipeline object (the reference's ``Sources2D`` role, but
    holding immutable state + config rather than mutable arrays)."""

    def __init__(self, params: Optional[CNMFEParams] = None):
        self.params = params or CNMFEParams.preset_1p()
        self.state: Optional[CNMFEState] = None
        self.info: dict = {}

    # ------------------------------------------------------------------ #
    def estimate_pixel_noise(self, Y: jnp.ndarray) -> jnp.ndarray:
        """Per-pixel noise sigma over the first ``noise_frame_cap`` frames
        (reference: ``Sources2D.m:328-379``)."""
        cap = min(self.params.noise_frame_cap, Y.shape[0])
        return noise_psd_frames(Y[:cap])

    # ------------------------------------------------------------------ #
    def fit(self, Y, n_outer: int = 2, verbose: bool = False,
            run_log=None, resume_from: Optional[str] = None,
            timer=None) -> CNMFEState:
        """Run the full pipeline on an in-memory movie Y (T, H, W).

        ``run_log``: optional :class:`cnmf_e_tpu.checkpoint.RunLog` —
        stage snapshots + timestamped logs (the reference's LOGS_<date>
        system, ``initComponents_parallel.m:43-158``).
        ``resume_from``: path to a previous snapshot .npz — skips
        initialization and restores A/C/S/background from it (the
        reference's resume-from-previous-run flow, made non-interactive).
        ``timer``: optional :class:`cnmf_e_tpu.utils.profiling.StageTimer`
        — accumulates per-stage wall time with forced device completion
        (the bench's stage table).
        """
        import contextlib
        p = self.params

        def _st(name, ref=None):
            if timer is None:
                return contextlib.nullcontext()
            return timer.stage(name, ref)
        # NaN scrubbing at the boundary (greedyROI_endoscope.m:100) —
        # guarded by a read-only any-NaN reduction: the common case (clean
        # movie) skips the full read+write scrub pass, and the one scalar
        # fetch lands before any other work is queued so it serializes
        # nothing (r4 verdict: scrub was ~0.9 s of the serialized table)
        ref = []
        with _st("scrub", ref):
            Y = jnp.asarray(Y, jnp.float32)
            if not bool(jnp.isfinite(jnp.sum(Y))):
                Y = jnp.nan_to_num(Y)
            ref.append(Y)
        _print = self._log(verbose)
        if run_log is not None:
            def log(msg):
                if callable(msg):
                    msg = msg()
                _print(msg)
                run_log.log(msg)
        elif verbose:
            def log(msg):
                _print(msg() if callable(msg) else msg)
        else:
            # logging disabled: never evaluate the message — several
            # messages embed ``int(state.n_active())``, a device->host
            # fetch that would force a sync in the async dispatch
            # pipeline (PERF.md: per-stage syncs serialize it)
            def log(msg):
                pass
        t0 = time.time()

        ref = []
        with _st("noise", ref):
            sn_pix = self.estimate_pixel_noise(Y)
            ref.append(sn_pix)
        log(f"pixel noise estimated ({time.time() - t0:.1f}s)")

        if resume_from is not None:
            from cnmf_e_tpu.checkpoint import restore_state
            T, H, W = Y.shape
            state = restore_state(resume_from, p.init.max_neurons, H, W, T)
            log(lambda: f"resumed {int(state.n_active())} neurons from "
                f"{resume_from}")
        else:
            # --- initialization ---------------------------------------- #
            ref = []
            with _st("init", ref):
                state, info = initialize_greedy(Y, p, verbose=verbose)
                ref.append(state)
            self.info.update(Cn=info["Cn"], PNR=info["PNR"])
            log(lambda: f"init: {int(state.n_active())} neurons "
                f"({time.time() - t0:.1f}s)")

            ref = []
            with _st("merge", ref):
                state, nm = merge_neurons(state, p, "dist_corr")
                ref.append(state)
            log(lambda nm=nm: f"merge(dist_corr): {int(nm)} clusters")
            if run_log is not None:
                run_log.snapshot("init", state)

            # --- background -------------------------------------------- #
            ref = []
            with _st("background", ref):
                state = update_background(Y, state, p, sn_pix=sn_pix)
                ref.append(state)
            log(f"background update ({time.time() - t0:.1f}s)")

            # --- residual pick ----------------------------------------- #
            ref = []
            with _st("residual_pick", ref):
                state = compact(state)
                resid = residual_movie(Y, state, p)
                state, _ = initialize_greedy(
                    resid, p, state=state, min_corr=p.init.min_corr_res,
                    min_pnr=p.init.min_pnr_res, verbose=verbose)
                ref.append(state)
            log(lambda: f"residual pick: total "
                f"{int(state.n_active())} neurons "
                f"({time.time() - t0:.1f}s)")

        # --- refinement (demo_large_data_1p.m order) -------------------- #
        # spatial first so residual duplicates refit onto the data, then
        # temporal + merge passes fold them into their originals
        ref = []
        with _st("spatial", ref):
            Ysig = subtract_background(Y, state, p)
            state = update_spatial(Ysig, state, p, sn_pix=sn_pix)
            ref.append(state)
        with _st("merge"):
            # a temporal update follows before C is consumed downstream:
            # defer re-deconvolution of merged traces to it
            state, nm = merge_neurons(state, p, "high_corr", deconv=False)
        log(lambda nm=nm: f"spatial + merge(high_corr: {int(nm)}) "
            f"({time.time() - t0:.1f}s)")

        for it in range(max(n_outer, 1)):
            # optional per-iteration background refresh (reference cadence,
            # demo_large_data_1p.m:199-201); the default amortized schedule
            # (refresh_every=0) holds B fixed between the post-init and
            # final refreshes — the reference's own within-loop semantics
            re_bg = p.background.refresh_every
            if re_bg > 0 and it > 0 and (it % re_bg) == 0:
                ref = []
                with _st("background", ref):
                    state = update_background(Y, state, p, sn_pix=sn_pix)
                    Ysig = subtract_background(Y, state, p)
                    ref.append(state)
            ref = []
            with _st("temporal", ref):
                state = update_temporal(Ysig, state, p)
                ref.append(state)
            with _st("qc"):
                state = remove_false_positives(state, p)
            with _st("merge"):
                state, nm = merge_neurons(state, p, "dist_corr",
                                          deconv=False)
            # spatial refit inside the loop: the reference demo interleaves
            # spatial with temporal every pass (demo_large_data_1p.m:199-213,
            # holding B fixed between background refreshes as here)
            ref = []
            with _st("spatial", ref):
                state = update_spatial(Ysig, state, p, sn_pix=sn_pix)
                ref.append(state)
            log(lambda it=it, nm=nm, state=state:
                f"iter {it}: temporal + QC + merge({nm}) + spatial, "
                f"{int(state.n_active())} neurons ({time.time() - t0:.1f}s)")

        # fold co-located duplicates (ghosts from the residual pick) into
        # their originals (reference: merge_close_neighbors with dmin_only)
        with _st("merge"):
            state, nm = merge_neurons(state, p, "dist_only", deconv=False)
        log(lambda nm=nm: f"merge(dist_only): {int(nm)} clusters")

        # final full pass on a refreshed background
        ref = []
        with _st("background", ref):
            state = update_background(Y, state, p, sn_pix=sn_pix)
            ref.append(state)
        ref = []
        with _st("spatial", ref):
            Ysig = subtract_background(Y, state, p)
            state = update_spatial(Ysig, state, p, sn_pix=sn_pix)
            ref.append(state)
        ref = []
        with _st("temporal", ref):
            state = update_temporal(Ysig, state, p)
            ref.append(state)
        k_before = int(state.n_active())
        with _st("qc"):
            state = remove_false_positives(state, p)
        with _st("merge"):
            # if either merge fires, the neuron count drops below k_before
            # and the conditional spatial+temporal refit below runs — so
            # deconvolution is safely deferred to it; both modes share
            # one adjacency fetch
            from cnmf_e_tpu.models.merge import merge_neurons_seq
            state, _ = merge_neurons_seq(
                state, p, ("dist_corr", "high_corr"), deconv=False)
        log(f"final pass ({time.time() - t0:.1f}s)")
        if int(state.n_active()) != k_before:
            ref = []
            with _st("spatial", ref):
                Ysig = subtract_background(Y, state, p)
                state = update_spatial(Ysig, state, p, sn_pix=sn_pix)
                ref.append(state)
            ref = []
            with _st("temporal", ref):
                state = update_temporal(Ysig, state, p)
                ref.append(state)
            with _st("qc"):
                state = remove_false_positives(state, p)
        state = tag_neurons(state, p)
        state = compact(state)
        log(lambda: f"done: {int(state.n_active())} neurons "
            f"({time.time() - t0:.1f}s)")
        if run_log is not None:
            run_log.snapshot("final", state)
        self.state = state
        return state

    # ------------------------------------------------------------------ #
    def dff(self, Y, window: Optional[int] = None, prctile: float = 50.0):
        assert self.state is not None, "run fit() first"
        return extract_dff(jnp.asarray(Y, jnp.float32), self.state,
                           self.params, window=window, prctile=prctile)

    def background(self, Y) -> jnp.ndarray:
        assert self.state is not None, "run fit() first"
        return background_of(jnp.asarray(Y, jnp.float32), self.state,
                             self.params)

    def reconstruction(self, Y) -> jnp.ndarray:
        """Denoised movie A C + B."""
        st = self.state
        return (jnp.einsum("khw,kt->thw", st.masked_A(), st.masked_C())
                + self.background(Y))

    def residual(self, Y) -> jnp.ndarray:
        return jnp.asarray(Y, jnp.float32) - self.reconstruction(Y)

    def compute_rss(self, Y) -> float:
        """||Y - AC - B||_F^2 (reference: ``Sources2D.m:1358-1510``)."""
        r = self.residual(Y)
        return float(jnp.sum(r * r))

    @staticmethod
    def _log(verbose):
        if verbose:
            return lambda msg: print(f"[cnmfe] {msg}", flush=True)
        return lambda msg: None
