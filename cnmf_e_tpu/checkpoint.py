"""Run logging and checkpoint/resume.

Reference subsystem (SURVEY.md section 5): each run creates a
``LOGS_<date>`` folder with a timestamped append-only ``logs.txt`` and an
``intermediate_results.mat`` that every stage appends a snapshot to;
``initComponents_parallel`` scans previous runs and restores state
(``initComponents_parallel.m:43-158``).

Here: a run directory with ``logs.txt``, per-stage ``.npz`` snapshots, and
``resume()`` restoring the latest snapshot of a given run (or the most
recent run in a workdir). Array payloads go through
:mod:`cnmf_e_tpu.io.export`.
"""

from __future__ import annotations

import datetime
import glob
import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from cnmf_e_tpu.config import CNMFEParams
from cnmf_e_tpu.io.export import load_results, save_results
from cnmf_e_tpu.models.state import CNMFEState, empty_state
from cnmf_e_tpu.ops.ring import RingWeights


class RunLog:
    """Append-only run log + stage snapshot store."""

    def __init__(self, workdir: str, run_name: Optional[str] = None,
                 params: Optional[CNMFEParams] = None):
        if run_name is None:
            run_name = "RUN_" + datetime.datetime.now().strftime(
                "%Y%m%d_%H%M%S")
        self.dir = os.path.join(workdir, run_name)
        os.makedirs(self.dir, exist_ok=True)
        self.log_path = os.path.join(self.dir, "logs.txt")
        if params is not None:
            with open(os.path.join(self.dir, "params.json"), "w") as f:
                f.write(params.to_json())
        self.log(f"run directory created: {self.dir}")

    def log(self, msg: str) -> None:
        stamp = datetime.datetime.now().strftime("%H:%M:%S")
        with open(self.log_path, "a") as f:
            f.write(f"[{stamp}] {msg}\n")

    # ---------------- snapshots ---------------- #
    def snapshot(self, stage: str, state: CNMFEState,
                 extras: Optional[dict] = None) -> str:
        stamp = datetime.datetime.now().strftime("%H%M%S")
        name = f"snapshot_{len(self._snapshots()):03d}_{stage}_{stamp}"
        path = save_results(os.path.join(self.dir, name), state,
                            extras=extras)
        self.log(f"stage '{stage}' snapshot -> {os.path.basename(path)}")
        return path

    def _snapshots(self):
        return sorted(glob.glob(os.path.join(self.dir, "snapshot_*.npz")))

    def latest_snapshot(self) -> Optional[str]:
        snaps = self._snapshots()
        return snaps[-1] if snaps else None


def restore_state(path: str, K_max: int, H: int, W: int, T: int
                  ) -> CNMFEState:
    """Rebuild a CNMFEState (fixed capacity K_max) from a snapshot file."""
    data = load_results(path)
    K = data["A"].shape[0]
    assert K <= K_max, f"snapshot has {K} neurons > capacity {K_max}"
    st = empty_state(K_max, H, W, T, p=data["g"].shape[1])
    st = st.replace(
        A=st.A.at[:K].set(jnp.asarray(data["A"])),
        C=st.C.at[:K].set(jnp.asarray(data["C"])),
        C_raw=st.C_raw.at[:K].set(jnp.asarray(data["C_raw"])),
        S=st.S.at[:K].set(jnp.asarray(data["S"])),
        g=st.g.at[:K].set(jnp.asarray(data["g"])),
        neuron_sn=st.neuron_sn.at[:K].set(jnp.asarray(data["neuron_sn"])),
        active=st.active.at[:K].set(True),
        b0=jnp.asarray(data["b0"]))
    if "ring_w" in data:
        st = st.replace(W=RingWeights(w=jnp.asarray(data["ring_w"]),
                                      w0=jnp.asarray(data["ring_w0"])))
    if "bg_b" in data:
        st = st.replace(b=jnp.asarray(data["bg_b"]),
                        f=jnp.asarray(data["bg_f"]))
    return st


def find_latest_run(workdir: str) -> Optional[str]:
    """Most recent run directory in a workdir (resume chooser analog —
    non-interactive: the config/CLI decides, not a prompt)."""
    runs = sorted(glob.glob(os.path.join(workdir, "RUN_*")))
    return runs[-1] if runs else None
