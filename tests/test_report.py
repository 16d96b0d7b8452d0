"""HTML report generation + QC decision application."""

import json
import os

import numpy as np
import jax.numpy as jnp

from cnmf_e_tpu.models.qc import delete_neurons
from cnmf_e_tpu.models.state import compact, empty_state
from cnmf_e_tpu.utils.report import generate_html_report


def _toy(K=4, H=32, W=32, T=120, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    A = np.zeros((K, H, W), np.float32)
    for k in range(K):
        cy, cx = rng.uniform(6, H - 6), rng.uniform(6, W - 6)
        A[k] = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 6.0)
    C = np.abs(rng.standard_normal((K, T))).astype(np.float32)
    return A, C


def test_report_is_selfcontained_html(tmp_path):
    A, C = _toy()
    Cn = np.abs(np.random.default_rng(1).standard_normal((32, 32)))
    path = generate_html_report(
        str(tmp_path / "report.html"), Cn, A, C,
        C_raw=C + 0.1, S=(C > 1.5).astype(np.float32),
        tags=np.array([0, 0, 2, 0]), fs=5.0,
        params={"demo": True}, title="toy")
    assert os.path.exists(path)
    text = open(path).read()
    assert text.startswith("<!DOCTYPE html>")
    assert '"K": 4' in text
    assert "data:image/png;base64," in text   # embedded, no external assets
    assert "decisions.json" in text
    # every neuron carries a contour + thumbnail
    assert text.count('"thumb": "data:image/png') == 4


def test_report_decimation_bounds_payload(tmp_path):
    A, C = _toy(T=20000)
    Cn = np.zeros((32, 32))
    path = generate_html_report(str(tmp_path / "r.html"), Cn, A, C,
                                max_points=1000)
    data = json.loads(open(path).read().split("const D = ")[1]
                      .split(";\n")[0])
    assert data["Td"] <= 1002
    assert data["T"] == 20000


def test_report_has_merge_marking_ui(tmp_path):
    """The report exposes the manual merge-pair flow
    (merge_neurons_dist_corr.m:129-173 / manual_merge_multi_pairs.m)."""
    A, C = _toy()
    path = generate_html_report(str(tmp_path / "r.html"),
                                np.zeros((32, 32)), A, C)
    text = open(path).read()
    assert "mark merge pair" in text
    assert "merge:merges.map" in text


def test_decisions_roundtrip_delete_and_merge(tmp_path):
    """decisions.json with both a merge pair and a rejection applies the
    way run.py --apply-decisions does: merge first, then delete, then
    compact."""
    from cnmf_e_tpu.config import CNMFEParams
    from cnmf_e_tpu.models.merge import merge_pairs

    rng = np.random.default_rng(3)
    A, C = _toy(K=5)
    st = empty_state(5, 32, 32, 120)
    st = st.replace(A=jnp.asarray(A), C=jnp.asarray(C),
                    C_raw=jnp.asarray(C + 0.05 * rng.standard_normal(
                        C.shape).astype(np.float32)),
                    S=jnp.asarray((C > 1.5).astype(np.float32)),
                    active=st.active.at[:].set(True))
    dec_path = tmp_path / "decisions.json"
    dec_path.write_text(json.dumps({"rejected": [4], "kept": [0, 1, 2, 3],
                                    "merge": [[0, 2]]}))

    dec = json.loads(dec_path.read_text())
    params = CNMFEParams()
    out, nm = merge_pairs(st, params, dec["merge"], deconv=False)
    assert nm == 1
    out = delete_neurons(out, dec["rejected"])
    out = compact(out)
    # 5 neurons - 1 merged away - 1 rejected = 3
    assert int(out.n_active()) == 3
    # merged footprint holds the union support of (0, 2)
    A_m = np.asarray(out.A)[np.asarray(out.active)]
    union = (A[0] + A[2]) > 0.05
    covered = (A_m.max(0) > 1e-4)[union].mean()
    assert covered > 0.9


def test_delete_neurons_masks_state():
    st = empty_state(6, 16, 16, 50)
    st = st.replace(active=jnp.asarray([True] * 5 + [False]),
                    A=jnp.ones((6, 16, 16)), C=jnp.ones((6, 50)))
    out = delete_neurons(st, [1, 3])
    assert int(out.n_active()) == 3
    assert float(out.A[1].sum()) == 0.0 and float(out.C[3].sum()) == 0.0
    assert float(out.A[0].sum()) > 0
    packed = compact(out)
    assert bool(np.all(np.asarray(packed.active)[:3]))
