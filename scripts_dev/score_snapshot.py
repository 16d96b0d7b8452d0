"""Score a scale-run snapshot offline against the store's ground truth.

Works host-side from the .npz artifacts only (no device): detection F1
on the float16 footprints, plus trace correlation on the stored T//25
decimation grid when the snapshot carries traces (iter snapshots do).

  PYTHONPATH=/root/repo python scripts_dev/score_snapshot.py /tmp/scale_full
"""

import json
import os
import sys

import numpy as np


def main():
    store = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_full"
    z = np.load(os.path.join(store, "snapshot.npz"))
    gt = np.load(os.path.join(store, "ground_truth.npz"))

    from cnmf_e_tpu.utils.metrics import detection_f1, trace_corr

    act = np.asarray(z["active"]).astype(bool)
    A = np.asarray(z["A"], np.float32)[act]
    f1 = detection_f1(A, np.asarray(gt["A"], np.float32))
    out = {
        "stage": str(z["stage"]),
        "neurons": int(act.sum()),
        "K_true": int(gt["A"].shape[0]),
        "f1": round(f1["f1"], 4),
        "precision": round(f1["precision"], 4),
        "recall": round(f1["recall"], 4),
    }
    gtC_path = os.path.join(store, "gt_C_decim.npy")
    if "C" in z.files and os.path.exists(gtC_path):
        gtC = np.asarray(np.load(gtC_path), np.float32)
        C = np.asarray(z["C"], np.float32)[act]
        Cd = C[:, ::25][:, :gtC.shape[1]]
        tc = trace_corr(Cd, gtC[:, :Cd.shape[1]], f1["matches"])
        out.update(trace_corr_mean=round(float(tc.mean()), 4),
                   trace_corr_median=round(float(np.median(tc)), 4),
                   trace_corr_p10=round(float(np.percentile(tc, 10)), 4),
                   n_scored_traces=int(tc.size))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
