"""Geometry library unit tests, cross-checked against OpenCV as an oracle."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoformer_tpu.geometry import (
    compute_valid_mask,
    corner_error,
    dlt_homography,
    ransac_homography,
    sample_homography,
    scale_homography,
    warp_points,
)
from geoformer_tpu.geometry.homography import four_point_homography, grid_points


def rand_H(rng, h=480, w=640, mag=80):
    corners = np.array([[0, 0], [0, h], [w, 0], [w, h]], np.float32)
    warp = rng.uniform(-mag, mag, size=(4, 2)).astype(np.float32)
    return cv2.getPerspectiveTransform(corners, corners + warp)


def test_warp_points_matches_cv2():
    rng = np.random.default_rng(0)
    H = rand_H(rng)
    pts = rng.uniform(0, 600, size=(50, 2)).astype(np.float32)
    ours = np.asarray(warp_points(jnp.asarray(pts), jnp.asarray(H)))
    ref = cv2.perspectiveTransform(pts[None], H)[0]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_warp_points_batched():
    rng = np.random.default_rng(1)
    Hs = np.stack([rand_H(rng) for _ in range(4)])
    pts = rng.uniform(0, 600, size=(4, 20, 2)).astype(np.float32)
    ours = np.asarray(warp_points(jnp.asarray(pts), jnp.asarray(Hs)))
    for b in range(4):
        ref = cv2.perspectiveTransform(pts[b][None], Hs[b])[0]
        np.testing.assert_allclose(ours[b], ref, rtol=1e-4, atol=1e-3)


def test_four_point_homography_matches_cv2():
    rng = np.random.default_rng(2)
    src = rng.uniform(0, 640, size=(4, 2)).astype(np.float32)
    dst = rng.uniform(0, 640, size=(4, 2)).astype(np.float32)
    ours = np.asarray(four_point_homography(jnp.asarray(src), jnp.asarray(dst)))
    ref = cv2.getPerspectiveTransform(src, dst)
    np.testing.assert_allclose(ours / ours[2, 2], ref / ref[2, 2], rtol=1e-3, atol=1e-4)


def test_sample_homography_invertible_and_plausible():
    keys = jax.random.split(jax.random.key(0), 32)
    Hs = jax.vmap(lambda k: sample_homography(k, (480, 640)))(keys)
    dets = jnp.linalg.det(Hs)
    assert bool(jnp.all(jnp.abs(dets) > 1e-6))
    # warp-unwarp round trip is identity
    pts = grid_points(6, 8, scale=64)
    for i in range(4):
        w = warp_points(pts, Hs[i])
        back = warp_points(w, jnp.linalg.inv(Hs[i]))
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-2)


def test_dlt_exact_on_clean_points():
    rng = np.random.default_rng(3)
    H = rand_H(rng)
    pts0 = rng.uniform(0, 600, size=(64, 2)).astype(np.float32)
    pts1 = cv2.perspectiveTransform(pts0[None], H)[0]
    Hhat = np.asarray(
        dlt_homography(jnp.asarray(pts0), jnp.asarray(pts1), jnp.ones(64))
    )
    err = float(corner_error(jnp.asarray(Hhat), jnp.asarray(H), (480, 640)))
    assert err < 0.1, err


def test_dlt_ignores_zero_weight_outliers():
    rng = np.random.default_rng(4)
    H = rand_H(rng)
    pts0 = rng.uniform(0, 600, size=(64, 2)).astype(np.float32)
    pts1 = cv2.perspectiveTransform(pts0[None], H)[0]
    pts1[:10] += rng.uniform(50, 100, size=(10, 2))  # corrupt
    w = np.ones(64, np.float32)
    w[:10] = 0.0
    Hhat = np.asarray(dlt_homography(jnp.asarray(pts0), jnp.asarray(pts1), jnp.asarray(w)))
    err = float(corner_error(jnp.asarray(Hhat), jnp.asarray(H), (480, 640)))
    assert err < 0.1, err


@pytest.mark.parametrize("outlier_frac", [0.0, 0.3, 0.5])
def test_ransac_recovers_H_with_outliers(outlier_frac):
    rng = np.random.default_rng(5)
    H = rand_H(rng, mag=60)
    n, cap = 200, 256
    pts0 = rng.uniform(50, 550, size=(n, 2)).astype(np.float32)
    pts1 = cv2.perspectiveTransform(pts0[None], H)[0]
    pts1 += rng.normal(0, 0.5, size=pts1.shape).astype(np.float32)  # inlier noise
    n_out = int(n * outlier_frac)
    pts1[:n_out] = rng.uniform(0, 600, size=(n_out, 2))
    # capacity-pad
    p0 = np.zeros((cap, 2), np.float32)
    p1 = np.zeros((cap, 2), np.float32)
    p0[:n], p1[:n] = pts0, pts1
    valid = np.zeros(cap, bool)
    valid[:n] = True

    out = ransac_homography(
        jax.random.key(0), jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(valid),
        thr=3.0, iters=512, refine_iters=2,
    )
    assert bool(out["ok"])
    err = float(corner_error(out["H"], jnp.asarray(H), (480, 640)))
    assert err < 2.0, (err, int(out["num_inliers"]))
    # inlier set should be dominated by the clean tail
    inl = np.asarray(out["inliers"])
    assert inl[n_out:n].mean() > 0.9


def test_ransac_not_ok_with_too_few_points():
    cap = 64
    p = jnp.zeros((cap, 2))
    valid = jnp.zeros(cap, bool).at[:3].set(True)
    out = ransac_homography(jax.random.key(0), p, p, valid, thr=3.0, iters=64)
    assert not bool(out["ok"])


def test_valid_mask_matches_cv2_warp():
    rng = np.random.default_rng(6)
    H = rand_H(rng, mag=100)
    h, w = 120, 160
    Hs = np.diag([w / 640.0, h / 480.0, 1.0]) @ H @ np.diag([640.0 / w, 480.0 / h, 1.0])
    ours = np.asarray(compute_valid_mask((h, w), jnp.asarray(Hs, jnp.float32)))
    ref = cv2.warpPerspective(np.ones((h, w), np.float32), Hs.astype(np.float32), (w, h))
    ref = (ref > 0.5).astype(np.float32)
    # Allow disagreement on boundary pixels only.
    disagree = np.abs(ours - ref).mean()
    assert disagree < 0.02, disagree


def test_scale_homography_frame_change():
    rng = np.random.default_rng(7)
    H = jnp.asarray(rand_H(rng))
    Hs = scale_homography(H, 0.5, 0.25)
    pts = jnp.asarray(rng.uniform(0, 600, size=(10, 2)).astype(np.float32))
    # warp in original frame then scale == scale then warp with conjugated H
    a = warp_points(pts, H) * jnp.array([0.5, 0.25])
    b = warp_points(pts * jnp.array([0.5, 0.25]), Hs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-3)


def test_ransac_exact_minimal_set():
    """Exactly 4 valid correspondences, noise-free: the solver must return
    the exact homography (annealed polish must not wander)."""
    import cv2

    rng = np.random.default_rng(11)
    src = np.array([[10, 10], [600, 20], [620, 460], [15, 440]], np.float32)
    dst = (src + rng.uniform(-40, 40, (4, 2))).astype(np.float32)
    H_gt = cv2.getPerspectiveTransform(src, dst)
    cap = 64
    p0 = np.zeros((cap, 2), np.float32)
    p1 = np.zeros((cap, 2), np.float32)
    v = np.zeros(cap, bool)
    p0[:4], p1[:4], v[:4] = src, dst, True
    out = ransac_homography(jax.random.key(0), jnp.asarray(p0),
                            jnp.asarray(p1), jnp.asarray(v), thr=3.0,
                            iters=64, refine_iters=2)
    assert bool(out["ok"])
    H = np.asarray(out["H"])
    np.testing.assert_allclose(H / H[2, 2], H_gt / H_gt[2, 2],
                               rtol=1e-2, atol=1e-2)


def test_ransac_huge_threshold_still_discriminates():
    """MSAC scoring: with thr far above the noise scale, the fit must stay
    tight (count-based scoring regressed to ~4 px here; see RESULTS.md
    round 5)."""
    import cv2

    rng = np.random.default_rng(5)
    src = rng.uniform(0, 640, (256, 2)).astype(np.float32)
    jit = rng.uniform(-80, 80, (4, 2)).astype(np.float32)
    corners = np.array([[0, 0], [640, 0], [640, 480], [0, 480]], np.float32)
    H_gt = cv2.getPerspectiveTransform(corners, corners + jit)
    ph = np.concatenate([src, np.ones((256, 1), np.float32)], 1) @ H_gt.T
    dst = (ph[:, :2] / ph[:, 2:]).astype(np.float32)
    dst += rng.normal(0, 1.0, dst.shape).astype(np.float32)
    dst[:64] = rng.uniform(0, 640, (64, 2)).astype(np.float32)  # outliers
    out = ransac_homography(jax.random.key(1), jnp.asarray(src),
                            jnp.asarray(dst), jnp.ones(256, bool), thr=15.0,
                            iters=512, refine_iters=3)
    assert bool(out["ok"])
    H = np.asarray(out["H"])
    ch = np.concatenate([corners, np.ones((4, 1), np.float32)], 1)
    wr = ch @ H_gt.T
    wr = wr[:, :2] / wr[:, 2:]
    wp = ch @ H.T
    wp = wp[:, :2] / wp[:, 2:]
    assert np.linalg.norm(wr - wp, axis=1).mean() < 1.5


def test_four_point_degenerate_collinear_is_nonfinite():
    """Three collinear source points make the 8x8 system singular; the
    Gauss-Jordan solve must surface inf/nan (RANSAC guards on isfinite),
    not a bogus finite H."""
    src = jnp.asarray(np.array([[0, 0], [10, 10], [20, 20], [5, 90]],
                               np.float32))
    dst = jnp.asarray(np.array([[0, 0], [10, 12], [22, 20], [5, 80]],
                               np.float32))
    H = np.asarray(four_point_homography(
        jnp.concatenate([src[:3], src[2:3]]),
        jnp.concatenate([dst[:3], dst[2:3]])))
    assert not np.isfinite(H).all()
