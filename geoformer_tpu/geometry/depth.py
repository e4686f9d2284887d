"""Depth-based keypoint warping and epipolar geometry (pure JAX).

Re-derivation of warp_kpts (reference:
model/loftr_src/loftr/utils/geometry.py:5-54) and the epipolar/pose metrics
(model/loftr_src/utils/metrics.py:12-69): depth lift -> K0^-1 -> T_0to1 ->
K1 projection, with covisibility + 0.2 relative depth-consistency masking.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def warp_kpts_depth(
    kpts0: jax.Array,
    depth0: jax.Array,
    depth1: jax.Array,
    T_0to1: jax.Array,
    K0: jax.Array,
    K1: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Warp pixel keypoints from image0 to image1 via depth + relative pose.

    Args:
        kpts0: [B, L, 2] (x, y) pixels.
        depth0/depth1: [B, H, W].
        T_0to1: [B, 4, 4] (or [B, 3, 4]) rigid transform cam0 -> cam1.
        K0/K1: [B, 3, 3] intrinsics.
    Returns:
        (valid [B, L] bool, w_kpts0 [B, L, 2]).
    """
    b, l, _ = kpts0.shape
    h, w = depth0.shape[1:3]

    def sample(depth, pts):
        x = jnp.clip(jnp.round(pts[..., 0]).astype(jnp.int32), 0, w - 1)
        y = jnp.clip(jnp.round(pts[..., 1]).astype(jnp.int32), 0, h - 1)
        flat = depth.reshape(depth.shape[0], -1)
        return jnp.take_along_axis(flat, y * w + x, axis=1)

    d0 = sample(depth0, kpts0)                              # [B, L]
    nonzero = d0 != 0

    ones = jnp.ones_like(kpts0[..., :1])
    kpts0_h = jnp.concatenate([kpts0, ones], -1) * d0[..., None]  # [B, L, 3]
    hp = jax.lax.Precision.HIGHEST
    cam0 = jnp.einsum("bij,blj->bli", jnp.linalg.inv(K0), kpts0_h,
                      precision=hp)
    R = T_0to1[:, :3, :3]
    t = T_0to1[:, :3, 3]
    cam1 = jnp.einsum("bij,blj->bli", R, cam0, precision=hp) + t[:, None, :]
    z_computed = cam1[..., 2]

    proj = jnp.einsum("bij,blj->bli", K1, cam1, precision=hp)
    w_kpts0 = proj[..., :2] / (proj[..., 2:] + 1e-4)

    covis = ((w_kpts0[..., 0] > 0) & (w_kpts0[..., 0] < w - 1)
             & (w_kpts0[..., 1] > 0) & (w_kpts0[..., 1] < h - 1))
    # out-of-view points sample depth at (0, 0) as in the reference
    safe = jnp.where(covis[..., None], w_kpts0, 0.0)
    # reference truncates with .long(); floor is identical for the in-bounds
    # (positive) coordinates that matter
    d1 = sample(depth1, jnp.floor(safe))
    consistent = jnp.abs((d1 - z_computed) / jnp.where(d1 == 0, 1e9, d1)) < 0.2
    return nonzero & covis & consistent, w_kpts0


def essential_from_pose(T_0to1: jax.Array) -> jax.Array:
    """E = [t]_x R from a relative pose [B, 4, 4]."""
    t = T_0to1[:, :3, 3]
    R = T_0to1[:, :3, :3]
    zeros = jnp.zeros_like(t[:, 0])
    Tx = jnp.stack([
        jnp.stack([zeros, -t[:, 2], t[:, 1]], -1),
        jnp.stack([t[:, 2], zeros, -t[:, 0]], -1),
        jnp.stack([-t[:, 1], t[:, 0], zeros], -1),
    ], axis=1)
    return Tx @ R


def symmetric_epipolar_distance(
    pts0: jax.Array, pts1: jax.Array, E: jax.Array,
    K0: jax.Array, K1: jax.Array,
) -> jax.Array:
    """Squared symmetric epipolar distance in normalized coordinates
    (metrics.py:30-47). pts: [L, 2], E/K: [3, 3]. Returns [L]."""
    p0 = (pts0 - K0[:2, 2][None]) / jnp.array([K0[0, 0], K0[1, 1]])[None]
    p1 = (pts1 - K1[:2, 2][None]) / jnp.array([K1[0, 0], K1[1, 1]])[None]
    p0h = jnp.concatenate([p0, jnp.ones_like(p0[:, :1])], -1)
    p1h = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], -1)
    Ep0 = p0h @ E.T
    p1Ep0 = jnp.sum(p1h * Ep0, -1)
    Etp1 = p1h @ E
    return p1Ep0 ** 2 * (
        1.0 / (Ep0[:, 0] ** 2 + Ep0[:, 1] ** 2 + 1e-12)
        + 1.0 / (Etp1[:, 0] ** 2 + Etp1[:, 1] ** 2 + 1e-12))


def relative_pose_error(T_0to1, R, t, ignore_gt_t_thr: float = 0.0):
    """Angular rotation/translation errors in degrees (numpy host metric,
    metrics.py:12-27)."""
    import numpy as np

    t_gt = np.asarray(T_0to1)[:3, 3]
    n = np.linalg.norm(t) * np.linalg.norm(t_gt)
    t_err = np.rad2deg(np.arccos(np.clip(np.dot(t, t_gt) / max(n, 1e-12),
                                         -1.0, 1.0)))
    t_err = np.minimum(t_err, 180 - t_err)
    if np.linalg.norm(t_gt) < ignore_gt_t_thr:
        t_err = 0.0
    R_gt = np.asarray(T_0to1)[:3, :3]
    cos = np.clip((np.trace(R.T @ R_gt) - 1) / 2, -1.0, 1.0)
    return float(t_err), float(np.rad2deg(np.abs(np.arccos(cos))))
