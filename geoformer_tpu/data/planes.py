"""Textured-plane scene renderer with exact per-pixel depth.

Host-side numpy/cv2 data generation (never in the compute path): each scene
is a set of textured quads {origin + s*e1 + t*e2}; a pinhole camera view is
composited far-to-near via exact plane-induced homography warps, yielding
both the image and the ground-truth depth map. This is the machine's
stand-in for posed-RGBD corpora (MegaDepth/ScanNet are env-blocked): the
localization protocol (scripts/localize_protocol.py) and the rendered depth
corpus (scripts/render_depth_corpus.py, VERDICT r4 next #4) both build on
it. Mirrors the geometry the reference's depth supervision consumes
(reference: model/loftr_src/loftr/utils/supervision.py:63-65 via
warp_kpts: datasets with per-pixel depth, K, and world-from-camera poses).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

Plane = Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]


def plane_homography(K: np.ndarray, T: np.ndarray, origin: np.ndarray,
                     e1: np.ndarray, e2: np.ndarray,
                     tex_hw: Tuple[int, int]) -> np.ndarray:
    """Image-from-texture homography for the quad {origin + s*e1 + t*e2},
    texture pixel (u, v) = (s * (W-1), t * (H-1))."""
    R, t = T[:3, :3], T[:3, 3]
    th, tw = tex_hw
    # world point = [e1 e2 origin] @ [s, t, 1]^T
    M = np.stack([e1, e2, origin], axis=1)
    H_img_from_st = K @ (R @ M + t[:, None] @ np.array([[0.0, 0.0, 1.0]]))
    S = np.diag([1.0 / (tw - 1), 1.0 / (th - 1), 1.0])  # texture px -> (s,t)
    return H_img_from_st @ S


def render_planes(K: np.ndarray, T: np.ndarray, planes: Sequence[Plane],
                  hw: Tuple[int, int],
                  return_depth: bool = False):
    """Composite plane textures far-to-near with proper per-pixel z-buffer.

    Returns the image in [0,1]; with ``return_depth`` also the depth map
    (0 where no plane is visible — MegaDepth's invalid-depth convention,
    geometry/depth.warp_kpts_depth treats depth<=0 as invalid).
    """
    import cv2

    h, w = hw
    img = np.zeros((h, w), np.float32)
    depth = np.full((h, w), np.inf, np.float32)
    for origin, e1, e2, tex in planes:
        Hm = plane_homography(K, T, origin, e1, e2, tex.shape)
        warped = cv2.warpPerspective(tex, Hm, (w, h),
                                     flags=cv2.INTER_LINEAR,
                                     borderValue=-1.0)
        mask = cv2.warpPerspective(np.ones_like(tex), Hm, (w, h),
                                   flags=cv2.INTER_NEAREST,
                                   borderValue=0.0) > 0.5
        # per-pixel depth of the plane: z of the world point seen at (x, y)
        Hinv = np.linalg.inv(Hm)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        st = np.stack([xx, yy, np.ones_like(xx)], 0).reshape(3, -1)
        uv = Hinv @ st
        with np.errstate(divide="ignore", invalid="ignore"):
            # off-quad pixels divide by ~0; they are dropped by `mask` below
            s = uv[0] / uv[2]
            tt = uv[1] / uv[2]
            th, tw = tex.shape
            Xw = (origin[:, None] + e1[:, None] * (s / (tw - 1))
                  + e2[:, None] * (tt / (th - 1)))
        z = (T[:3, :3] @ Xw + T[:3, 3:4])[2].reshape(h, w)
        vis = mask & (z > 0.1) & (z < depth)
        img[vis] = warped[vis]
        depth[vis] = z[vis]
    img = np.clip(img, 0.0, 1.0)
    if return_depth:
        return img, np.where(np.isfinite(depth), depth, 0.0).astype(
            np.float32)
    return img


def look_at(center, target, up=(0, -1, 0)) -> np.ndarray:
    """World->camera 4x4 for a camera at ``center`` looking at ``target``."""
    z = np.asarray(target, float) - np.asarray(center, float)
    z /= np.linalg.norm(z)
    x = np.cross(np.asarray(up, float), z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], 0)  # world->cam rows
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = -R @ np.asarray(center, float)
    return T


def room_scene(rng: np.random.Generator, textures: np.ndarray,
               depth_z: float = 8.0, cluttered: bool = False) -> List[Plane]:
    """Random 3-5-plane 'room': back wall + floor + side wall, optionally a
    ceiling strip and a free-standing slab, with jittered extents.

    cluttered=True guarantees ceiling + (textures-permitting) multiple
    mid-scene slabs at staggered depths. Rationale (round-5 measured): the
    depth trainer's pose-AUC validation recovers relative pose via the
    essential matrix, which is DEGENERATE when the matched set lies on one
    plane — on plain rooms the capacity-ranked matches collapse onto the
    texture-rich back wall (per-match depth p10-p90 ~0.2 m) and pose
    errors flip by tens of degrees. Cluttered scenes keep depth diversity
    inside the top-k match set."""
    zb = depth_z * rng.uniform(0.85, 1.15)
    planes: List[Plane] = [
        # back wall
        (np.array([-5.0, -3.0, zb]), np.array([10.0, 0, 0]),
         np.array([0, 6.0, 0]), textures[0]),
        # floor, sloping toward the back wall
        (np.array([-5.0, rng.uniform(1.8, 2.5), 2.0]),
         np.array([10.0, 0, 0]),
         np.array([0, rng.uniform(0.8, 1.5), zb - 2.0]), textures[1]),
        # side wall (left or right)
        (np.array([rng.choice([-4.5, 4.5]), -3.0, 2.0]),
         np.array([0, 0, zb - 2.0]), np.array([0, 6.0, 0]), textures[2]),
    ]
    if len(textures) > 3 and (cluttered or rng.random() < 0.6):
        # ceiling strip
        planes.append(
            (np.array([-5.0, rng.uniform(-3.0, -2.2), 2.5]),
             np.array([10.0, 0, 0]),
             np.array([0, rng.uniform(-0.8, -0.2), zb - 2.5]), textures[3]))
    n_slabs = 0
    if len(textures) > 4:
        n_slabs = (1 + int(rng.random() < 0.7) if cluttered
                   else int(rng.random() < 0.5))
    for k in range(n_slabs):
        # free-standing tilted slabs at staggered depths
        cx = rng.uniform(-2.5, 2.5)
        zc = zb * rng.uniform(0.42, 0.75)
        tex = textures[4 + (k % max(1, len(textures) - 4))]
        planes.append(
            (np.array([cx - 1.2, rng.uniform(-1.2, 0.6), zc]),
             np.array([rng.uniform(2.0, 3.0), 0, rng.uniform(-0.8, 0.8)]),
             np.array([rng.uniform(-0.4, 0.4), rng.uniform(1.8, 2.6), 0]),
             tex))
    return planes
