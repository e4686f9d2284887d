"""FIRE retinal image registration evaluation.

Re-implementation of the reference protocol (reference: eval_FIRE.py:11-120,
eval_tool/immatch/utils/fire_helper.py:11-238): 133 pairs in classes
S/P/A (P37_1_2 excluded), imsize 768, RANSAC thr 15; per-pair error is the
mean distance of the 10 GT control points warped by the predicted homography;
AUC per class = mean fraction of pairs below threshold for thresholds 1..25 px,
plus the mAUC over classes and failed/inaccurate rates (mae>50 or mee>20).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Optional

import numpy as np

from geoformer_tpu.eval.matcher import BatchedMatcher, load_gray
from geoformer_tpu.eval.hpatches import fit_homography_np


def _auc_curve(errors: np.ndarray, limit: int = 25) -> float:
    """Mean of per-threshold below-rate for thr = 1..limit
    (fire_helper.py:11-42 semantics)."""
    if errors.size == 0:
        return 0.0
    rates = [(errors <= t).mean() for t in range(1, limit + 1)]
    return float(np.mean(rates))


def eval_fire(
    params,
    config,
    data_root: str,
    imsize: int = 768,
    ransac_thr: float = 15.0,
    batch_size: int = 2,
    max_pairs: Optional[int] = None,
    log=print,
) -> Dict:
    """data_root layout (official FIRE): images/*.jpg,
    ground_truth/control_points_<PAIR>_1_2.txt."""
    gt_files = sorted(glob.glob(
        os.path.join(data_root, "ground_truth", "control_points_*_1_2.txt")))
    gt_files = [g for g in gt_files if "P37" not in g]  # eval_FIRE.py:31
    if max_pairs:
        gt_files = gt_files[:max_pairs]

    matcher = BatchedMatcher(config, params, batch_size=batch_size)
    errs = {"S": [], "P": [], "A": []}
    failed, inaccurate = 0, 0
    n = 0

    for gt in gt_files:
        pair = os.path.basename(gt)[len("control_points_"):-len("_1_2.txt")]
        cls = pair[0]
        im1p = os.path.join(data_root, "images", f"{pair}_1.jpg")
        im2p = os.path.join(data_root, "images", f"{pair}_2.jpg")
        if not (os.path.exists(im1p) and os.path.exists(im2p)):
            continue
        pts = np.loadtxt(gt)                      # [10, 4]: x1 y1 x2 y2
        im1, sc1 = load_gray(im1p, imsize)
        im2, sc2 = load_gray(im2p, imsize)
        (mk0, mk1, mconf), = matcher.match_batch([im1], [im2])
        # matches -> original frame
        mk0o = mk0 * np.array(sc1)
        mk1o = mk1 * np.array(sc2)
        n += 1
        H, _ = fit_homography_np(mk0o.astype(np.float32),
                                 mk1o.astype(np.float32), ransac_thr)
        if H is None:
            failed += 1
            errs[cls].append(np.inf)
            continue
        p1 = np.concatenate([pts[:, :2], np.ones((len(pts), 1))], 1)
        proj = p1 @ H.T
        proj = proj[:, :2] / proj[:, 2:]
        d = np.sqrt(((proj - pts[:, 2:4]) ** 2).sum(1))
        mae, mee = d.max(), np.median(d)
        if mae > 50 or mee > 20:
            inaccurate += 1
        errs[cls].append(float(d.mean()))

    aucs = {c: _auc_curve(np.asarray(v)) for c, v in errs.items() if v}
    mauc = float(np.mean(list(aucs.values()))) if aucs else 0.0
    out = {"n_pairs": n, "failed": failed, "inaccurate": inaccurate,
           "auc_per_class": aucs, "mAUC": mauc}
    log(f">>FIRE: pairs={n} failed={failed} inaccurate={inaccurate} "
        f"AUC={aucs} mAUC={mauc:.4f}")
    return out
