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
    (fire_helper.py:11-42 semantics; note the reference's STRICT '<')."""
    if errors.size == 0:
        return 0.0
    rates = [(errors < t).mean() for t in range(1, limit + 1)]
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
        # The reference matches QUERY (_2) against REFERENCE (_1)
        # (fire_helper.py:111-114), fits H in the RESIZED frame (thr 15
        # resized px, the no_match_upscale path), rescales H into original
        # frames, then warps the image-2 control points (cols 2:4) and
        # compares against the image-1 points (cols 0:2).
        im1, sc1 = load_gray(im1p, imsize)        # _1: reference/destination
        im2, sc2 = load_gray(im2p, imsize)        # _2: query/source
        (mkq, mkr, mconf), = matcher.match_batch([im2], [im1])
        n += 1
        H, _ = fit_homography_np(mkq.astype(np.float32),
                                 mkr.astype(np.float32), ransac_thr)
        if H is None:
            failed += 1
            errs[cls].append(np.inf)
            continue
        # resized-frame H -> original frames (fire_helper.py:141-147)
        H = np.diag([sc1[0], sc1[1], 1.0]) @ H @ \
            np.diag([1.0 / sc2[0], 1.0 / sc2[1], 1.0])
        p2 = np.concatenate([pts[:, 2:4], np.ones((len(pts), 1))], 1)
        proj = p2 @ H.T
        proj = proj[:, :2] / proj[:, 2:]
        d = np.sqrt(((proj - pts[:, :2]) ** 2).sum(1))
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
