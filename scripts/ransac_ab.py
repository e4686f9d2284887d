"""Head-to-head: on-device RANSAC vs the installed OpenCV solvers.

VERDICT r4 next #5 / SURVEY §7.3 hard part #2: every driver-vs-driver
parity test patches the solver out, so `geometry/ransac.py` had never been
compared against `cv2.findHomography` on identical contaminated
correspondence sets. This rig generates synthetic match sets with known GT
homographies (the 1-pt HPatches gate's failure mode space): sweep inlier
ratio x noise sigma, estimate H with

  - ours:        geometry/ransac.ransac_homography via the EXACT eval-path
                 wrapper (eval/hpatches.fit_homography_np: iters=2048,
                 refine_iters=3)
  - cv2-ransac:  cv2.findHomography(..., cv2.RANSAC, thr)
                 (reference: eval_tool/immatch/utils/hpatches_helper.py:216)
  - cv2-magsac:  cv2.findHomography(..., cv2.USAC_MAGSAC, thr)

and scores mean GT-corner error per trial, aggregated to median error and
the protocol's AUC@1/3/5/10 over trials. Thresholds 3 (HPatches/ISC),
8 (GAM, reference model/geo_module.py:48) and 15 (FIRE) are swept.

    JAX_PLATFORMS=cpu python scripts/ransac_ab.py          # full sweep
    JAX_PLATFORMS=cpu python scripts/ransac_ab.py --quick  # CI-sized
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

W_FRAME, H_FRAME = 640, 480
CORNERS = np.array([[0, 0], [0, H_FRAME - 1], [W_FRAME - 1, 0],
                    [W_FRAME - 1, H_FRAME - 1]], np.float64)


def gt_homography(rng, mag: float = 0.18) -> np.ndarray:
    """Reference-family random perspective: corner jitter of +-mag."""
    import cv2

    src = np.array([[0, 0], [W_FRAME, 0], [W_FRAME, H_FRAME],
                    [0, H_FRAME]], np.float32)
    jit = (rng.uniform(-mag, mag, (4, 2))
           * np.array([[W_FRAME, H_FRAME]], np.float32)).astype(np.float32)
    return cv2.getPerspectiveTransform(src, src + jit).astype(np.float64)


def make_matches(rng, H, n=1024, inlier_ratio=0.7, noise=1.0):
    """Contaminated correspondence set: inliers are H-warped points + iid
    gaussian noise; outliers are uniform in frame 2."""
    n_in = int(round(n * inlier_ratio))
    p0 = rng.uniform([8, 8], [W_FRAME - 8, H_FRAME - 8], (n, 2))
    ph = np.concatenate([p0, np.ones((n, 1))], 1) @ H.T
    p1 = ph[:, :2] / ph[:, 2:]
    p1[:n_in] += rng.normal(0, noise, (n_in, 2))
    p1[n_in:] = rng.uniform([0, 0], [W_FRAME, H_FRAME], (n - n_in, 2))
    # shuffle so inliers are not a prefix (cv2 PROSAC-style samplers would
    # otherwise see an unrealistically sorted set)
    perm = rng.permutation(n)
    return p0[perm].astype(np.float32), p1[perm].astype(np.float32)


def corner_err(H_est, H_gt) -> float:
    if H_est is None or not np.isfinite(H_est).all():
        return float("inf")
    ch = np.concatenate([CORNERS, np.ones((4, 1))], 1)
    wr = ch @ H_gt.T
    wr = wr[:, :2] / wr[:, 2:]
    wp = ch @ H_est.T
    denom = wp[:, 2:]
    if (np.abs(denom) < 1e-9).any():
        return float("inf")
    wp = wp[:, :2] / denom
    return float(np.linalg.norm(wr - wp, axis=1).mean())


def solve_ours(p0, p1, thr, seed):
    from geoformer_tpu.eval.hpatches import fit_homography_np

    H, _ = fit_homography_np(p0, p1, thr, seed=seed)
    return H


def solve_cv2(p0, p1, thr, method):
    import cv2

    H, _ = cv2.findHomography(p0, p1, method, thr)
    return H


def auc(errs, thresholds=(1, 3, 5, 10)):
    from geoformer_tpu.eval.metrics import cal_error_auc

    return cal_error_auc(np.asarray(errs), thresholds).tolist()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trials", type=int, default=25)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=20260820)
    ap.add_argument("--quick", action="store_true",
                    help="small sweep for CI (2 configs, 5 trials)")
    ap.add_argument("--json-out", default="/tmp/ransac_ab.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import cv2

    if args.quick:
        ratios, noises, thrs, trials = [0.5], [1.0], [3.0], 5
    else:
        ratios = [0.3, 0.5, 0.7, 0.9]
        noises = [0.5, 1.0, 2.0, 3.0]
        thrs = [3.0, 8.0, 15.0]
        trials = args.trials

    solvers = {
        "ours": lambda p0, p1, thr, s: solve_ours(p0, p1, thr, s),
        "cv2-ransac": lambda p0, p1, thr, s: solve_cv2(p0, p1, thr,
                                                       cv2.RANSAC),
        "cv2-magsac": lambda p0, p1, thr, s: solve_cv2(p0, p1, thr,
                                                       cv2.USAC_MAGSAC),
    }
    rows = []
    t_solver = {k: 0.0 for k in solvers}
    for thr in thrs:
        for ratio in ratios:
            for noise in noises:
                errs = {k: [] for k in solvers}
                for t in range(trials):
                    rng = np.random.default_rng(
                        args.seed + 7919 * t + int(1e6 * ratio)
                        + int(1e4 * noise) + int(thr))
                    H_gt = gt_homography(rng)
                    p0, p1 = make_matches(rng, H_gt, n=args.n,
                                          inlier_ratio=ratio, noise=noise)
                    for name, fn in solvers.items():
                        t0 = time.perf_counter()
                        H = fn(p0, p1, thr, args.seed + t)
                        t_solver[name] += time.perf_counter() - t0
                        errs[name].append(corner_err(H, H_gt))
                row = {"thr": thr, "inlier_ratio": ratio, "noise": noise}
                for name in solvers:
                    row[name] = {
                        "median_err": round(float(np.median(errs[name])), 3),
                        "auc": [round(a, 4) for a in auc(errs[name])],
                    }
                rows.append(row)
                print(f"thr={thr:4.0f} ratio={ratio:.1f} noise={noise:.1f}: "
                      + "  ".join(
                          f"{n}={row[n]['median_err']:7.3f}px"
                          for n in solvers), flush=True)

    # aggregate: pooled AUC over every trial of every config, per solver
    summary = {}
    for name in solvers:
        pooled = [e for row in rows
                  for e in [row[name]["median_err"]]]
        summary[name] = {
            "median_of_medians": round(float(np.median(pooled)), 3),
            "worst_median": round(float(np.max(pooled)), 3),
            "total_solve_s": round(t_solver[name], 1),
        }
    out = {"protocol": "ransac_ab", "n": args.n, "trials": trials,
           "rows": rows, "summary": summary}
    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary, indent=1))
    print("wrote", args.json_out)


if __name__ == "__main__":
    main()
