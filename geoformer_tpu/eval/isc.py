"""ISC-HE industrial homography estimation evaluation.

Re-implementation of the reference protocol (reference: eval_ISC.py:13-135,
eval_tool/immatch/utils/my_helper.py:58-238): query/refer image pairs with
normalized GT control-point files (x1 y1 x2 y2 in [0,1], scaled by image
sizes), imsize 480, H fit on predicted matches (original frame), AUC@[3,5,10]
of the mean control-point error, plus failed/inaccurate rates
(mae>10 or mee>5).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Optional

import numpy as np

from geoformer_tpu.eval.hpatches import fit_homography_np
from geoformer_tpu.eval.matcher import BatchedMatcher, load_gray
from geoformer_tpu.eval.metrics import cal_error_auc


def eval_isc(
    params,
    config,
    data_root: str,
    imsize: int = 480,
    ransac_thr: float = 3.0,
    thresholds=(3, 5, 10),
    batch_size: int = 2,
    max_pairs: Optional[int] = None,
    log=print,
) -> Dict:
    """data_root layout: query/<name>_2.jpg, refer/<name>_1.jpg,
    gd/<name>_2-<name>_1.txt (eval_ISC.py:33-42)."""
    queries = sorted(glob.glob(os.path.join(data_root, "query", "*")))
    if max_pairs:
        queries = queries[:max_pairs]
    matcher = BatchedMatcher(config, params, batch_size=batch_size)

    dists, inlier_rates = [], []
    failed = inaccurate = n = 0
    for q in queries:
        name = os.path.basename(q).split("_")[0]
        r = os.path.join(data_root, "refer", f"{name}_1.jpg")
        gd = os.path.join(data_root, "gd", f"{name}_2-{name}_1.txt")
        if not (os.path.exists(r) and os.path.exists(gd)):
            continue
        import cv2
        im1_raw = cv2.imread(q, cv2.IMREAD_GRAYSCALE)
        im2_raw = cv2.imread(r, cv2.IMREAD_GRAYSCALE)
        h1r, w1r = im1_raw.shape
        h2r, w2r = im2_raw.shape
        im1, sc1 = load_gray(q, imsize)
        im2, sc2 = load_gray(r, imsize)
        n += 1
        (mk0, mk1, _), = matcher.match_batch([im1], [im2])
        mk0o = mk0 * np.array(sc1)
        mk1o = mk1 * np.array(sc2)
        H, inl = fit_homography_np(mk0o.astype(np.float32),
                                   mk1o.astype(np.float32), ransac_thr)
        if H is None:
            failed += 1
            dists.append(1e6)
            inlier_rates.append(0.0)
            continue
        pts = np.loadtxt(gd)
        raw = pts[:, :2] * np.array([w1r, h1r])
        dst = pts[:, 2:4] * np.array([w2r, h2r])
        ph = np.concatenate([raw, np.ones((len(raw), 1))], 1)
        proj = ph @ H.T
        proj = proj[:, :2] / proj[:, 2:]
        d = np.sqrt(((dst - proj) ** 2).sum(1))
        if d.max() > 10 or np.median(d) > 5:
            inaccurate += 1
        dists.append(float(d.mean()))
        inlier_rates.append(float(inl.mean()))

    auc = cal_error_auc(dists, thresholds).tolist() if dists else []
    out = {
        "n_pairs": n, "failed": failed, "inaccurate": inaccurate,
        "auc": auc,
        "acceptable": (n - failed - inaccurate) / n if n else 0.0,
        "inlier_rate": float(np.mean(inlier_rates)) if inlier_rates else 0.0,
    }
    log(f">>ISC-HE: pairs={n} failed={failed} inaccurate={inaccurate} "
        f"AUC@{list(thresholds)}={auc}")
    return out
