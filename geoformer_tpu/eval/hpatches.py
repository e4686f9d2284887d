"""HPatches homography-estimation + matching evaluation.

Re-implementation of the reference protocol (reference: eval_Hpatches.py:12-114,
eval_tool/immatch/utils/hpatches_helper.py:94-317): 108 sequences x 5 pairs,
min-edge resize to 480 (/8 grid), GT homography rescaled into the resized
frame (scale_H / no_match_upscale path), robust H fit on predicted matches,
mean corner distance vs GT, correctness and AUC at 1/3/5/10 px, split by
illumination / viewpoint sequences. RANSAC runs on-device (geometry/ransac.py)
instead of cv2/pydegensac.
"""

from __future__ import annotations

import glob
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from geoformer_tpu.eval.matcher import BatchedMatcher, load_gray
from geoformer_tpu.eval.metrics import cal_error_auc, correctness, reproj_dists
from geoformer_tpu.geometry.ransac import ransac_homography


def _scale_H(sx: float, sy: float) -> np.ndarray:
    return np.diag([sx, sy, 1.0])


def fit_homography_np(p0: np.ndarray, p1: np.ndarray, thr: float,
                      iters: int = 2048, cap: int = 4096, seed: int = 0):
    """On-device RANSAC wrapper for host point sets; returns (H, inliers) or
    (None, None). Inputs beyond ``cap`` correspondences are truncated (with a
    warning) — harmless at the default match capacities (<= 1024), but keep
    it visible rather than silent."""
    n = len(p0)
    if n < 4:
        return None, None
    if n > cap:
        import warnings

        warnings.warn(f"fit_homography_np: truncating {n} -> {cap} "
                      "correspondences (raise cap= to keep them all)")
        n = cap
    cap = max(64, min(cap, int(2 ** np.ceil(np.log2(n)))))
    a = np.zeros((cap, 2), np.float32)
    b = np.zeros((cap, 2), np.float32)
    v = np.zeros(cap, bool)
    a[:n], b[:n], v[:n] = p0[:n], p1[:n], True
    out = ransac_homography(jax.random.key(seed), jnp.asarray(a),
                            jnp.asarray(b), jnp.asarray(v), thr=thr,
                            iters=iters, refine_iters=3)
    if not bool(out["ok"]):
        return None, None
    return np.asarray(out["H"]), np.asarray(out["inliers"])[:n]


def eval_hpatches(
    params,
    config,
    data_root: str,
    imsize: int = 480,
    ransac_thr: float = 3.0,
    thresholds=(1, 3, 5, 10),
    batch_size: int = 2,
    max_seqs: Optional[int] = None,
    task: str = "both",
    prewarm: bool = True,
    log=print,
) -> Dict:
    """Run the full benchmark; returns a dict of metrics."""
    seq_dirs = sorted(glob.glob(os.path.join(data_root, "*")))
    if max_seqs:
        seq_dirs = seq_dirs[:max_seqs]
    matcher = BatchedMatcher(config, params, batch_size=batch_size)

    if prewarm:
        # resolution-bucket census up front so every compile is paid (and
        # logged) before the timed pair loop
        from geoformer_tpu.eval.matcher import resize_shape

        def resized(path):
            try:  # PIL reads just the header; cv2 fallback loads pixels
                from PIL import Image

                with Image.open(path) as im:
                    wo, ho = im.size
            except ImportError:
                import cv2

                ho, wo = cv2.imread(path, cv2.IMREAD_GRAYSCALE).shape
            wt, ht, _ = resize_shape(wo, ho, imsize)
            return (ht, wt)

        # One census entry PER SEQUENCE: the eval loop below calls
        # match_batch once per sequence, which pads every pair to the
        # sequence's elementwise-max bucket — a shape no individual pair
        # need land in. Aggregating here keeps the guarantee that no
        # compile happens inside the timed loop.
        pair_shapes = []
        for seq_dir in seq_dirs:
            p1 = os.path.join(seq_dir, "1.ppm")
            if not os.path.exists(p1):
                continue
            shapes = [resized(p1)]
            for idx in range(2, 7):
                p2 = os.path.join(seq_dir, f"{idx}.ppm")
                if os.path.exists(p2):
                    shapes.append(resized(p2))
            joint = (max(h for h, _ in shapes), max(w for _, w in shapes))
            pair_shapes.append((joint, joint))
        matcher.prewarm(pair_shapes, log=log)

    dists_all, dists_i, dists_v = [], [], []
    inlier_rates, n_matches, match_times = [], [], []
    h_failed = 0
    mma = {t: [] for t in range(1, 16)}
    mma_i = {t: [] for t in range(1, 16)}
    mma_v = {t: [] for t in range(1, 16)}

    for seq_dir in seq_dirs:
        sname = os.path.basename(seq_dir)
        im1_path = os.path.join(seq_dir, "1.ppm")
        if not os.path.exists(im1_path):
            continue
        im1, sc1 = load_gray(im1_path, imsize)
        pairs, gts, scales2 = [], [], []
        for idx in range(2, 7):
            im2_path = os.path.join(seq_dir, f"{idx}.ppm")
            H_gt = np.loadtxt(os.path.join(seq_dir, f"H_1_{idx}"))
            im2, sc2 = load_gray(im2_path, imsize)
            pairs.append(im2)
            # rescale GT into the resized frames (hpatches_helper.py:186-192)
            Hs = np.linalg.inv(_scale_H(*sc2)) @ H_gt @ _scale_H(*sc1)
            gts.append(Hs)
            scales2.append(sc2)

        t0 = time.time()
        results = matcher.match_batch([im1] * len(pairs), pairs)
        match_times.append((time.time() - t0) / len(pairs))

        for (mk0, mk1, mconf), H_gt in zip(results, gts):
            n_matches.append(len(mk0))
            # --- matching MMA
            if "matching" in task or task == "both":
                if len(mk0) == 0:
                    d = np.array([np.inf])
                else:
                    d = reproj_dists(mk0, mk1, H_gt)
                for t in mma:
                    mma[t].append((d <= t).mean())
                    (mma_i if sname[0] == "i" else mma_v)[t].append(
                        (d <= t).mean())
            # --- homography estimation
            if "homography" in task or task == "both":
                H_pred, inliers = fit_homography_np(mk0, mk1, ransac_thr)
                if H_pred is None:
                    h_failed += 1
                    dist = np.nan
                    inlier_rates.append(0.0)
                else:
                    h, w = im1.shape
                    corners = np.array(
                        [[0, 0], [0, h - 1], [w - 1, 0], [w - 1, h - 1]],
                        np.float64)
                    ch = np.concatenate([corners, np.ones((4, 1))], 1)
                    wr = ch @ H_gt.T
                    wr = wr[:, :2] / wr[:, 2:]
                    wp = ch @ H_pred.T
                    wp = wp[:, :2] / wp[:, 2:]
                    dist = np.linalg.norm(wr - wp, axis=1).mean()
                    inlier_rates.append(float(inliers.mean()))
                dists_all.append(dist)
                (dists_i if sname[0] == "i" else dists_v).append(dist)

    out = {
        "n_pairs": len(dists_all) or len(n_matches),
        "est_failed": h_failed,
        "mean_matches": float(np.mean(n_matches)) if n_matches else 0.0,
        "match_time": float(np.mean(match_times)) if match_times else 0.0,
        "inlier_rate": float(np.mean(inlier_rates)) if inlier_rates else 0.0,
    }
    if dists_all:
        out["correct_a"] = correctness(dists_all, thresholds).tolist()
        out["correct_i"] = correctness(dists_i, thresholds).tolist()
        out["correct_v"] = correctness(dists_v, thresholds).tolist()
        out["auc_a"] = cal_error_auc(dists_all, thresholds).tolist()
        out["auc_i"] = cal_error_auc(dists_i, thresholds).tolist()
        out["auc_v"] = cal_error_auc(dists_v, thresholds).tolist()
    if any(len(v) for v in mma.values()):
        # per-split matching accuracy, as the reference reports
        # (hpatches_helper.py:299-317)
        out["mma_a"] = {t: float(np.mean(v)) for t, v in mma.items() if v}
        out["mma_i"] = {t: float(np.mean(v)) for t, v in mma_i.items() if v}
        out["mma_v"] = {t: float(np.mean(v)) for t, v in mma_v.items() if v}

    log(f">>HPatches: pairs={out['n_pairs']} est_failed={h_failed} "
        f"matches={out['mean_matches']:.1f} time={out['match_time']:.3f}s")
    if "auc_a" in out:
        log(f"Hest Correct: a={out['correct_a']}")
        log(f"Hest AUC:     a={out['auc_a']}")
        log(f"   illum AUC: i={out['auc_i']}")
        log(f"   view  AUC: v={out['auc_v']}")
    return out
