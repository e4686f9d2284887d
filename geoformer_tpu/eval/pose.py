"""Relative pose estimation + AUC aggregation (MegaDepth/ScanNet validation).

Re-implementation of estimate_pose / compute_pose_errors / error_auc /
aggregate_metrics (reference: model/loftr_src/utils/metrics.py:72-193).
Pose recovery uses OpenCV's essential-matrix RANSAC on the host (a metric,
not the compute path); epipolar distances come from geometry/depth.py.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from geoformer_tpu.geometry.depth import relative_pose_error


def estimate_pose(kpts0: np.ndarray, kpts1: np.ndarray, K0: np.ndarray,
                  K1: np.ndarray, thresh: float = 0.5, conf: float = 0.99999):
    """(R, t, inlier_mask) from matched keypoints, or None
    (metrics.py:72-98)."""
    import cv2

    if len(kpts0) < 5:
        return None
    K0 = np.asarray(K0, np.float64)
    K1 = np.asarray(K1, np.float64)
    norm0 = (kpts0 - K0[[0, 1], [2, 2]][None]) / K0[[0, 1], [0, 1]][None]
    norm1 = (kpts1 - K1[[0, 1], [2, 2]][None]) / K1[[0, 1], [0, 1]][None]
    ransac_thr = thresh / np.mean([K0[0, 0], K1[1, 1], K0[0, 0], K1[1, 1]])
    E, mask = cv2.findEssentialMat(
        norm0, norm1, np.eye(3), threshold=ransac_thr, prob=conf,
        method=cv2.RANSAC)
    if E is None:
        return None
    best = (0, None, None, None)
    for e in np.split(E, len(E) // 3):
        n, R, t, _ = cv2.recoverPose(e, norm0, norm1, np.eye(3), 1e9,
                                     mask=mask.copy())
        if n > best[0]:
            best = (n, R, t[:, 0], mask.ravel() > 0)
    return best[1:] if best[0] > 0 else None


def error_auc(errors: Sequence[float], thresholds=(5, 10, 20)) -> Dict:
    """Pose AUC via the cumulative-recall trapezoid (metrics.py:139-156)."""
    errors = np.asarray(errors, np.float64)
    errors = np.where(np.isnan(errors), np.inf, errors)
    errors = np.sort(np.append([0.0], errors))
    recall = np.arange(len(errors)) / (len(errors) - 1) if len(errors) > 1 \
        else np.zeros(1)
    out = {}
    for t in thresholds:
        last = np.searchsorted(errors, t)
        y = np.append(recall[:last], recall[last - 1])
        x = np.append(errors[:last], t)
        out[f"auc@{t}"] = float(np.trapezoid(y, x) / t)
    return out


def aggregate_metrics(metrics: Dict[str, List], epi_err_thr: float = 5e-4,
                      thresholds=(5, 10, 20)) -> Dict:
    """Dedup by pair id (DDP duplicate filter in the reference,
    metrics.py:180-182), pose AUC + epipolar precision.

    The reference's OrderedDict((iden, id)) overwrite keeps the LAST
    occurrence of a duplicated identifier — matched here (cross-tested;
    irrelevant in practice since DDP duplicates carry identical values)."""
    ids = metrics["identifiers"]
    last = {}
    for i, idn in enumerate(ids):
        last[idn] = i
    keep = np.asarray(sorted(last.values()))
    pose_errs = np.maximum(np.asarray(metrics["R_errs"])[keep],
                           np.asarray(metrics["t_errs"])[keep])
    out = error_auc(pose_errs, thresholds)
    prec = [np.mean(np.asarray(e) < epi_err_thr) if len(e) else 0.0
            for i, e in enumerate(metrics["epi_errs"]) if i in set(keep)]
    out[f"prec@{epi_err_thr:.0e}"] = float(np.mean(prec)) if prec else 0.0
    return out


def pose_error_for_pair(mkpts0: np.ndarray, mkpts1: np.ndarray,
                        K0: np.ndarray, K1: np.ndarray, T_0to1: np.ndarray,
                        thresh: float = 0.5):
    """(t_err_deg, R_err_deg, inliers) for a pair; (inf, inf, []) on failure
    (metrics.py:101-134)."""
    ret = estimate_pose(mkpts0, mkpts1, K0, K1, thresh)
    if ret is None:
        return float("inf"), float("inf"), np.array([])
    R, t, inliers = ret
    t_err, R_err = relative_pose_error(T_0to1, R, t, ignore_gt_t_thr=0.0)
    return t_err, R_err, inliers
