"""RANSAC fidelity gate vs the installed OpenCV (VERDICT r4 next #5).

The eval-path solver (eval/hpatches.fit_homography_np -> geometry/ransac)
must match cv2.findHomography(RANSAC) quality on contaminated
correspondence sets — the 1-pt HPatches real-data gate leans on this
equivalence (reference solves with cv2/pydegensac:
eval_tool/immatch/utils/hpatches_helper.py:216-218).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from ransac_ab import corner_err, gt_homography, make_matches, solve_ours

cv2 = pytest.importorskip("cv2")


def _median_errs(ratio, noise, thr, trials=6, n=512):
    ours, ref = [], []
    for t in range(trials):
        rng = np.random.default_rng(1234 + t)
        H_gt = gt_homography(rng)
        p0, p1 = make_matches(rng, H_gt, n=n, inlier_ratio=ratio,
                              noise=noise)
        ours.append(corner_err(solve_ours(p0, p1, thr, seed=t), H_gt))
        H_cv, _ = cv2.findHomography(p0, p1, cv2.RANSAC, thr)
        ref.append(corner_err(H_cv, H_gt))
    return float(np.median(ours)), float(np.median(ref))


@pytest.mark.parametrize("ratio,noise,thr", [
    (0.5, 1.0, 3.0),   # the protocol's operating point
    (0.3, 2.0, 8.0),   # GAM regime: heavy contamination, loose threshold
])
def test_ours_matches_cv2_quality(ratio, noise, thr):
    ours, ref = _median_errs(ratio, noise, thr)
    # Parity margin: inside 1.5x of cv2's median corner error plus a
    # 0.3 px absolute floor (protocol noise at these trial counts; the
    # full sweep table lives in RESULTS.md via scripts/ransac_ab.py).
    assert np.isfinite(ours)
    assert ours <= 1.5 * ref + 0.3, (ours, ref)


def test_ours_succeeds_at_low_inlier_ratio():
    """30% inliers, 3 px noise at thr 3 (noise ~ threshold, the hardest
    regime): the annealed wide->narrow polish must hold MAGSAC-level
    accuracy here (full sweep: ours 1.05 px vs cv2-RANSAC 4.82)."""
    ours, _ = _median_errs(0.3, 3.0, 3.0, trials=4)
    assert ours < 2.5, ours
