"""Pure-JAX homography toolbox.

Re-derivation of the reference's torch/cv2/kornia geometry layer
(reference: utils/homography.py:86-386, eval_tool utils) as vmap-first,
fixed-shape JAX. No OpenCV in the compute path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def warp_points(points: jax.Array, H: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Warp 2-D points through homographies.

    Mirrors ``warp_points_batch`` (reference: utils/homography.py:86-105)
    including the zero-denominator guard.

    Args:
        points: [..., N, 2] (x, y).
        H: [..., 3, 3] broadcastable homographies.
    Returns:
        [..., N, 2] warped (x, y).
    """
    # Explicit multiply-adds instead of a 3x3 einsum: exact f32 on the VPU
    # (TPU MXU matmuls default to reduced precision, which is unacceptable for
    # pixel-coordinate warps).
    batch = jnp.broadcast_shapes(points.shape[:-2], H.shape[:-2])
    points = jnp.broadcast_to(points, batch + points.shape[-2:])
    x, y = points[..., 0], points[..., 1]
    Hb = jnp.broadcast_to(H, batch + (3, 3))
    u = Hb[..., 0, 0, None] * x + Hb[..., 0, 1, None] * y + Hb[..., 0, 2, None]
    v = Hb[..., 1, 0, None] * x + Hb[..., 1, 1, None] * y + Hb[..., 1, 2, None]
    d = Hb[..., 2, 0, None] * x + Hb[..., 2, 1, None] * y + Hb[..., 2, 2, None]
    d = jnp.where(d == 0, eps, d)
    return jnp.stack([u / d, v / d], axis=-1)


def grid_points(h: int, w: int, scale: int = 1, dtype=jnp.float32) -> jax.Array:
    """[h*w, 2] (x, y) pixel coordinates of a regular grid with stride ``scale``.

    Mirrors ``get_map_keypoints`` (reference: utils/common_utils.py:137-144):
    cell (r, c) -> pixel (c*scale, r*scale).
    """
    ys = jnp.arange(h, dtype=dtype) * scale
    xs = jnp.arange(w, dtype=dtype) * scale
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)


def _disk_kernel(radius: int):
    """Elliptical structuring element — the kernel the reference feeds its
    erosion, cv2.getStructuringElement(MORPH_ELLIPSE, (2r, 2r))
    (utils/homography.py:288-292). Uses cv2's own rasterization when
    available (it is quirky for even sizes); numpy disk fallback otherwise.
    Host-side static construction either way."""
    import numpy as np

    size = 2 * radius
    try:
        import cv2

        return cv2.getStructuringElement(
            cv2.MORPH_ELLIPSE, (size, size)).astype(np.float32)
    except ImportError:
        c = (size - 1) / 2
        yy, xx = np.mgrid[0:size, 0:size]
        return (((xx - c) ** 2 + (yy - c) ** 2) <= radius ** 2).astype(
            np.float32)


def erode_mask(mask: jax.Array, radius: int) -> jax.Array:
    """Binary erosion of a [..., h, w] {0,1} mask by a disk of ``radius``.

    TPU-native form of erosion2d (reference: utils/homography.py:142-157):
    a pixel survives iff every kernel tap inside the footprint is 1 — an
    XLA reduce-window/convolution instead of the unfold-min trick.
    """
    if radius <= 0:
        return mask
    k = jnp.asarray(_disk_kernel(radius))
    kh, kw = k.shape
    lead = mask.shape[:-2]
    x = mask.reshape((-1,) + mask.shape[-2:])[..., None]   # [N, h, w, 1]
    out = jax.lax.conv_general_dilated(
        x, k[:, :, None, None],
        window_strides=(1, 1),
        padding=[((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    eroded = (out[..., 0] >= k.sum() - 1e-3).astype(mask.dtype)
    return eroded.reshape(lead + mask.shape[-2:])


def compute_valid_mask(image_hw, H: jax.Array, inverse: bool = False,
                       erosion_radius: int = 0) -> jax.Array:
    """Boolean [h, w] mask of pixels that map inside the image under ``H``.

    The reference warps a ones-image through the homography with kornia and
    optionally erodes the border margin (utils/homography.py:258-297).
    Equivalent closed form: pixel p is valid iff H^{-1} p lands inside the
    source image (warping img by H places source pixel q at position H q).
    We compute it analytically — no image resampling — then erode.

    Args:
        image_hw: (h, w) static.
        H: [3, 3]. If ``inverse`` the matrix is already the dst->src mapping.
        erosion_radius: discard a margin of this radius (disk kernel).
    Returns:
        [h, w] float32 mask in {0, 1}.
    """
    h, w = image_hw
    Minv = H if inverse else jnp.linalg.inv(H)
    pts = grid_points(h, w)                      # dst pixel centers
    src = warp_points(pts, Minv)
    inb = (
        (src[:, 0] >= -0.5) & (src[:, 0] <= w - 0.5)
        & (src[:, 1] >= -0.5) & (src[:, 1] <= h - 0.5)
    )
    mask = inb.reshape(h, w).astype(jnp.float32)
    return erode_mask(mask, erosion_radius)


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """Depth-to-space on NHWC: [N, H, W, C*r*r] -> [N, r*H, r*W, C]
    (reference NCHW version: utils/homography.py:160-184)."""
    n, h, w, c = x.shape
    assert c % (r * r) == 0, (c, r)
    x = x.reshape(n, h, w, r, r, c // (r * r))
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * r, w * r, c // (r * r))


def pixel_shuffle_inv(x: jax.Array, r: int) -> jax.Array:
    """Space-to-depth on NHWC: [N, H, W, C] -> [N, H/r, W/r, C*r*r]
    (reference: utils/homography.py:187-212)."""
    n, h, w, c = x.shape
    assert h % r == 0 and w % r == 0, (h, w, r)
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // r, w // r, c * r * r)


def mutual_matches_under_homography(
    kpts1: jax.Array, kpts2: jax.Array, H: jax.Array,
    dist_thresh: float = 3.0,
    valid1=None, valid2=None,
):
    """Mutual-NN keypoint matching under a known homography, fixed-shape.

    Re-derivation of torch_find_matches (reference:
    utils/preprocess_utils.py:72-94, n_iters=1): kpts1 warp into image2,
    mutual argmin of the distance matrix, gated by dist_thresh.

    Args:
        kpts1: [N1, 2]; kpts2: [N2, 2]; H: [3, 3] (1 -> 2).
        valid1/valid2: optional boolean slot masks for padded inputs.
    Returns:
        (match12 [N1] int32 index into kpts2, matched [N1] bool).
    """
    p1 = warp_points(kpts1, H)
    d = jnp.linalg.norm(p1[:, None, :] - kpts2[None, :, :], axis=-1)
    if valid1 is not None:
        d = jnp.where(valid1[:, None], d, jnp.inf)
    if valid2 is not None:
        d = jnp.where(valid2[None, :], d, jnp.inf)
    min1 = d.argmin(axis=1)                                     # [N1]
    min2 = d.argmin(axis=0)                                     # [N2]
    mutual = jnp.take(min2, min1) == jnp.arange(kpts1.shape[0])
    close = jnp.take_along_axis(d, min1[:, None], axis=1)[:, 0] < dist_thresh
    return min1.astype(jnp.int32), mutual & close


def four_point_homography(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Exact homography from 4 correspondences via an 8x8 linear solve.

    Equivalent to cv2.getPerspectiveTransform (used by the reference's
    ``sample_homography``, utils/homography.py:352-386). h33 is fixed to 1.

    Args:
        src, dst: [4, 2].
    Returns:
        [3, 3] H with H @ [src,1] ~ [dst,1].
    """
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    ax = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y], axis=-1)
    ay = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y], axis=-1)
    A = jnp.concatenate([ax, ay], axis=0)          # [8, 8]
    b = jnp.concatenate([u, v], axis=0)            # [8]
    sol = _solve8(A, b)
    return jnp.concatenate([sol, jnp.ones((1,), sol.dtype)]).reshape(3, 3)


def _solve8(A: jax.Array, b: jax.Array) -> jax.Array:
    """8x8 linear solve by unrolled Gauss-Jordan with partial pivoting.

    jnp.linalg.solve lowers to an LU custom call that cost 4.25 ms/fwd in
    the round-5 device trace at RANSAC batch sizes (vmap over thousands of
    minimal samples); this unrolled form compiles to a handful of fused
    vector ops per step and vmaps cleanly. Singular systems yield inf/nan,
    matching LU behavior (callers guard with isfinite)."""
    n = 8
    M = jnp.concatenate([A, b[:, None]], axis=1)   # [8, 9]
    rows = jnp.arange(n)
    for k in range(n):
        col = jnp.abs(M[:, k])
        col = jnp.where(rows >= k, col, -1.0)
        p = jnp.argmax(col)
        rk, rp = M[k], M[p]
        M = M.at[k].set(rp).at[p].set(rk)
        M = M.at[k].set(M[k] / M[k, k])
        factor = M[:, k:k + 1]
        mask = (rows != k)[:, None]
        M = M - jnp.where(mask, factor * M[k][None, :], 0.0)
    return M[:, n]


def sample_homography(key: jax.Array, image_hw, small_warp_p: float = 0.2,
                      flip_p: float = 0.2) -> jax.Array:
    """Random training homography, matching the reference's sampler semantics
    (utils/homography.py:352-386): random 4-corner perturbation in
    [-rg/3, rg/3] (rg = max(h, w)), 20% chance of a small +-5px warp, and 20%
    chance of composing/replacing with an axis flip.

    Returns [3, 3] float32.
    """
    h, w = image_hw
    rg = max(h, w)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    corners = jnp.array([[0, 0], [0, h], [w, 0], [w, h]], jnp.float32)
    big = jax.random.randint(k1, (4, 2), -rg // 3, rg // 3).astype(jnp.float32)
    small = jax.random.randint(k2, (4, 2), -5, 5).astype(jnp.float32)
    warp = jnp.where(jax.random.uniform(k3) < small_warp_p, small, big)
    H = four_point_homography(corners, corners + warp)

    flips = jnp.stack([
        jnp.array([[-1, 0, w], [0, 1, 0], [0, 0, 1]], jnp.float32),
        jnp.array([[1, 0, 0], [0, -1, h], [0, 0, 1]], jnp.float32),
    ])
    flip = flips[jax.random.randint(k4, (), 0, 2)]
    u = jax.random.uniform(k5, (2,))
    H = jnp.where(
        u[0] < flip_p,
        jnp.where(u[1] < 0.6, flip, H @ flip),
        H,
    )
    return H


def scale_homography(H: jax.Array, sx: float, sy: float) -> jax.Array:
    """Conjugate H by a diagonal scaling: maps between resized coordinate frames
    (reference: utils/preprocess_utils.py:96-105, hpatches_helper.py:90-93)."""
    S = jnp.array([[sx, 0, 0], [0, sy, 0], [0, 0, 1]], H.dtype)
    Sinv = jnp.array([[1 / sx, 0, 0], [0, 1 / sy, 0], [0, 0, 1]], H.dtype)
    return S @ H @ Sinv


def corner_error(H_pred: jax.Array, H_gt: jax.Array, image_hw) -> jax.Array:
    """Mean corner-reprojection distance between two homographies — the HPatches
    Hest metric (reference: eval_tool/immatch/utils/hpatches_helper.py:228-240)."""
    h, w = image_hw
    corners = jnp.array(
        [[0, 0], [0, h - 1], [w - 1, 0], [w - 1, h - 1]], jnp.float32
    )
    a = warp_points(corners, H_pred)
    b = warp_points(corners, H_gt)
    return jnp.linalg.norm(a - b, axis=-1).mean()
