"""Ground-truth label generation for coarse and fine matching.

Re-derivation of spvs_coarse / spvs_fine2 (reference:
model/loftr_src/loftr/utils/supervision.py:23-115, 269-387) for the
homography-supervised (self-supervised Oxford) branch, fixed-shape throughout.
The depth branch (MegaDepth/ScanNet) plugs in through the same interfaces via
geometry/depth.warp_kpts.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from geoformer_tpu.geometry.depth import warp_kpts_depth
from geoformer_tpu.geometry.homography import warp_points
from geoformer_tpu.models.coarse_matching import CoarseMatches, match_coords


def spvs_coarse_homography(
    H_0to1: jax.Array,
    H_1to0: jax.Array,
    image_hw,
    coarse_scale: int = 8,
    mask0: Optional[jax.Array] = None,
    mask1: Optional[jax.Array] = None,
) -> jax.Array:
    """One-hot coarse GT confidence via bidirectional warp + cycle check.

    Mirrors spvs_coarse (supervision.py:23-115): warp the 1/8 grid of image0
    into image1 and back, round to cells, keep mutual (cycle-consistent)
    assignments, ignore cell 0 ("top-left corner" guard), and zero padded
    regions.

    Args:
        H_0to1/H_1to0: [B, 3, 3].
        image_hw: (H, W) static image size.
        mask0/mask1: [B, h_c, w_c] optional padding masks.
    Returns:
        conf_gt: [B, L0, L1] in {0, 1}.
    """
    Himg, Wimg = image_hw
    h0 = h1 = Himg // coarse_scale
    w0 = w1 = Wimg // coarse_scale
    l0, l1 = h0 * w0, h1 * w1
    b = H_0to1.shape[0]

    grid0 = match_coords(jnp.arange(l0), w0, coarse_scale)      # [L0, 2] px
    grid1 = match_coords(jnp.arange(l1), w1, coarse_scale)
    grid0 = jnp.broadcast_to(grid0[None], (b, l0, 2))
    grid1 = jnp.broadcast_to(grid1[None], (b, l1, 2))
    if mask0 is not None:
        grid0 = grid0 * mask0.reshape(b, l0, 1)
    if mask1 is not None:
        grid1 = grid1 * mask1.reshape(b, l1, 1)

    w_pt0_c = warp_points(grid0, H_0to1) / coarse_scale          # cells in im1
    w_pt1_c = warp_points(grid1, H_1to0) / coarse_scale
    return _coarse_gt_from_warps(w_pt0_c, w_pt1_c, (h0, w0), (h1, w1))


def spvs_coarse_homography_sparse(
    H_0to1: jax.Array,
    H_1to0: jax.Array,
    image_hw,
    coarse_scale: int = 8,
    mask0: Optional[jax.Array] = None,
    mask1: Optional[jax.Array] = None,
):
    """Sparse-row form of spvs_coarse_homography: (gt_j [B, L0], gt_valid
    [B, L0]) for the streaming loss — no [B, L0, L1] materialization."""
    Himg, Wimg = image_hw
    h0 = h1 = Himg // coarse_scale
    w0 = w1 = Wimg // coarse_scale
    l0, l1 = h0 * w0, h1 * w1
    b = H_0to1.shape[0]

    grid0 = match_coords(jnp.arange(l0), w0, coarse_scale)
    grid1 = match_coords(jnp.arange(l1), w1, coarse_scale)
    grid0 = jnp.broadcast_to(grid0[None], (b, l0, 2))
    grid1 = jnp.broadcast_to(grid1[None], (b, l1, 2))
    if mask0 is not None:
        grid0 = grid0 * mask0.reshape(b, l0, 1)
    if mask1 is not None:
        grid1 = grid1 * mask1.reshape(b, l1, 1)

    w_pt0_c = warp_points(grid0, H_0to1) / coarse_scale
    w_pt1_c = warp_points(grid1, H_1to0) / coarse_scale
    return sparse_coarse_gt_from_warps(w_pt0_c, w_pt1_c, (h0, w0), (h1, w1))


def spvs_coarse_depth(
    depth0: jax.Array,
    depth1: jax.Array,
    T_0to1: jax.Array,
    T_1to0: jax.Array,
    K0: jax.Array,
    K1: jax.Array,
    image_hw,
    coarse_scale: int = 8,
    mask0: Optional[jax.Array] = None,
    mask1: Optional[jax.Array] = None,
    scale0: Optional[jax.Array] = None,
    scale1: Optional[jax.Array] = None,
) -> jax.Array:
    """Depth-supervised coarse GT (MegaDepth/ScanNet branch of spvs_coarse,
    supervision.py:40-76): same cycle-consistency construction, with the warp
    going through depth lift + relative pose (geometry/depth.warp_kpts_depth)
    in ORIGINAL image coordinates — ``scale0``/``scale1`` [B, 2] are the
    (orig/resized) factors from the resize step, matching the reference's
    ``scale0 = scale * data['scale0']``.
    """
    Himg, Wimg = image_hw
    h0 = h1 = Himg // coarse_scale
    w0 = w1 = Wimg // coarse_scale
    l0, l1 = h0 * w0, h1 * w1
    b = depth0.shape[0]
    s0 = jnp.ones((b, 1, 2)) if scale0 is None else scale0[:, None, :]
    s1 = jnp.ones((b, 1, 2)) if scale1 is None else scale1[:, None, :]

    grid0 = jnp.broadcast_to(
        match_coords(jnp.arange(l0), w0, coarse_scale)[None], (b, l0, 2))
    grid1 = jnp.broadcast_to(
        match_coords(jnp.arange(l1), w1, coarse_scale)[None], (b, l1, 2))
    if mask0 is not None:
        grid0 = grid0 * mask0.reshape(b, l0, 1)
    if mask1 is not None:
        grid1 = grid1 * mask1.reshape(b, l1, 1)

    # NOTE: the warp's validity mask is deliberately NOT applied — the
    # reference uses the raw warped points (supervision.py:60-67, "no depth
    # consistency check, since it leads to worse results experimentally"),
    # so points projecting within half a cell outside the border still
    # supervise border cells. Cross-tested against the reference's own code
    # (tests/test_reference_parity.py::test_spvs_coarse_depth_*).
    _, w_pt0 = warp_kpts_depth(grid0 * s0, depth0, depth1, T_0to1, K0, K1)
    _, w_pt1 = warp_kpts_depth(grid1 * s1, depth1, depth0, T_1to0, K1, K0)
    w_pt0 = w_pt0 / (coarse_scale * s1)
    w_pt1 = w_pt1 / (coarse_scale * s0)
    return _coarse_gt_from_warps(w_pt0, w_pt1, (h0, w0), (h1, w1))


def spvs_coarse_depth_sparse(
    depth0: jax.Array,
    depth1: jax.Array,
    T_0to1: jax.Array,
    T_1to0: jax.Array,
    K0: jax.Array,
    K1: jax.Array,
    image_hw,
    coarse_scale: int = 8,
    mask0: Optional[jax.Array] = None,
    mask1: Optional[jax.Array] = None,
    scale0: Optional[jax.Array] = None,
    scale1: Optional[jax.Array] = None,
):
    """Sparse-row form of spvs_coarse_depth for the streaming loss."""
    Himg, Wimg = image_hw
    h0 = h1 = Himg // coarse_scale
    w0 = w1 = Wimg // coarse_scale
    l0, l1 = h0 * w0, h1 * w1
    b = depth0.shape[0]
    s0 = jnp.ones((b, 1, 2)) if scale0 is None else scale0[:, None, :]
    s1 = jnp.ones((b, 1, 2)) if scale1 is None else scale1[:, None, :]

    grid0 = jnp.broadcast_to(
        match_coords(jnp.arange(l0), w0, coarse_scale)[None], (b, l0, 2))
    grid1 = jnp.broadcast_to(
        match_coords(jnp.arange(l1), w1, coarse_scale)[None], (b, l1, 2))
    if mask0 is not None:
        grid0 = grid0 * mask0.reshape(b, l0, 1)
    if mask1 is not None:
        grid1 = grid1 * mask1.reshape(b, l1, 1)

    # raw warped points, no validity masking — see spvs_coarse_depth
    _, w_pt0 = warp_kpts_depth(grid0 * s0, depth0, depth1, T_0to1, K0, K1)
    _, w_pt1 = warp_kpts_depth(grid1 * s1, depth1, depth0, T_1to0, K1, K0)
    w_pt0 = w_pt0 / (coarse_scale * s1)
    w_pt1 = w_pt1 / (coarse_scale * s0)
    return sparse_coarse_gt_from_warps(w_pt0, w_pt1, (h0, w0), (h1, w1))


def sparse_coarse_gt_from_warps(w_pt0_c, w_pt1_c, hw0_c, hw1_c):
    """Sparse row form of the coarse GT assignment.

    The cycle-consistent one-hot of spvs_coarse (supervision.py:77-98) has at
    most one GT column per image0 cell, so the whole [B, L0, L1] matrix is
    losslessly (gt_j [B, L0] int32, gt_valid [B, L0] bool). The streaming loss
    (ops/fused_loss.py) consumes this directly; the dense matrix is only built
    for tests/back-compat via _coarse_gt_from_warps.
    """
    h0, w0 = hw0_c
    h1, w1 = hw1_c
    l0, l1 = h0 * w0, h1 * w1

    def nearest(pts, w, h, l):
        r = jnp.round(pts).astype(jnp.int32)
        idx = r[..., 0] + r[..., 1] * w
        oob = ((r[..., 0] < 0) | (r[..., 0] >= w)
               | (r[..., 1] < 0) | (r[..., 1] >= h))
        return jnp.where(oob, 0, jnp.clip(idx, 0, l - 1))

    nearest1 = nearest(w_pt0_c, w1, h1, l1)                      # [B, L0]
    nearest0 = nearest(w_pt1_c, w0, h0, l0)                      # [B, L1]

    loop_back = jnp.take_along_axis(nearest0, nearest1, axis=1)  # [B, L0]
    correct = loop_back == jnp.arange(l0)[None]
    correct = correct.at[:, 0].set(False)                        # corner guard
    return nearest1.astype(jnp.int32), correct


def _coarse_gt_from_warps(w_pt0_c, w_pt1_c, hw0_c, hw1_c) -> jax.Array:
    h0, w0 = hw0_c
    h1, w1 = hw1_c
    l0, l1 = h0 * w0, h1 * w1
    b = w_pt0_c.shape[0]
    gt_j, gt_valid = sparse_coarse_gt_from_warps(
        w_pt0_c, w_pt1_c, hw0_c, hw1_c)

    cols = jnp.where(gt_valid, gt_j, l1)                         # drop invalid
    conf_gt = jnp.zeros((b, l0, l1 + 1), jnp.float32)
    brow = jnp.arange(b)[:, None]
    conf_gt = conf_gt.at[brow, jnp.arange(l0)[None], cols].set(1.0)
    return conf_gt[:, :, :l1]


def spvs_fine_homography(
    matches: CoarseMatches,
    H_0to1: jax.Array,
    grid_w0: int,
    grid_w1: int,
    coarse_scale: int = 8,
    fine_scale: int = 2,
    window: int = 5,
    dist_thr: float = 3.0,
) -> jax.Array:
    """Fine window GT labels (spvs_fine2, supervision.py:269-387).

    Builds the 5x5 pixel windows around both coarse centers, warps the image0
    window through H, computes the [M, WW, WW] distance map, keeps only the
    global argmin per window pair, and labels it positive iff 0 < d <= 3 px.

    Returns label [B, M, WW, WW] in {0, 1}.
    """
    b, m = matches.i_ids.shape
    ww = window * window
    r = window // 2

    centers0 = match_coords(matches.i_ids, grid_w0, coarse_scale)  # [B,M,2] px
    centers1 = match_coords(matches.j_ids, grid_w1, coarse_scale)
    # window offsets in fine cells, scaled to pixels
    gy, gx = jnp.meshgrid(jnp.arange(window), jnp.arange(window), indexing="ij")
    off = jnp.stack([gx.reshape(-1) - r, gy.reshape(-1) - r], -1).astype(
        jnp.float32) * fine_scale                                  # [WW, 2] px
    kpts0 = centers0[:, :, None, :] + off[None, None]              # [B,M,WW,2]
    kpts1 = centers1[:, :, None, :] + off[None, None]

    w_pt0 = warp_points(kpts0.reshape(b, m * ww, 2), H_0to1).reshape(
        b, m, ww, 2)
    return _fine_label_from_warp(w_pt0, kpts1, window, dist_thr)


def spvs_fine_depth(
    matches: CoarseMatches,
    depth0: jax.Array,
    depth1: jax.Array,
    T_0to1: jax.Array,
    K0: jax.Array,
    K1: jax.Array,
    grid_w0: int,
    grid_w1: int,
    coarse_scale: int = 8,
    fine_scale: int = 2,
    window: int = 5,
    dist_thr: float = 3.0,
    scale0: Optional[jax.Array] = None,
    scale1: Optional[jax.Array] = None,
) -> jax.Array:
    """Depth branch of spvs_fine2 (supervision.py:319-330): window points of
    image0 (in ORIGINAL resolution via scale0/scale1 [B, 2]) warped through
    depth+pose; invalid warps pushed to -1e5 (the reference's -100000 fill)
    so they never label a positive. The 3 px distance threshold applies in
    original-resolution pixels, exactly as in the reference."""
    b, m = matches.i_ids.shape
    ww = window * window
    r = window // 2
    s0 = jnp.ones((b, 1, 1, 2)) if scale0 is None else scale0[:, None, None, :]
    s1 = jnp.ones((b, 1, 1, 2)) if scale1 is None else scale1[:, None, None, :]
    centers0 = match_coords(matches.i_ids, grid_w0, coarse_scale)
    centers1 = match_coords(matches.j_ids, grid_w1, coarse_scale)
    gy, gx = jnp.meshgrid(jnp.arange(window), jnp.arange(window), indexing="ij")
    off = jnp.stack([gx.reshape(-1) - r, gy.reshape(-1) - r], -1).astype(
        jnp.float32) * fine_scale
    kpts0 = (centers0[:, :, None, :] + off[None, None]) * s0
    kpts1 = (centers1[:, :, None, :] + off[None, None]) * s1

    v0, w_pt0 = warp_kpts_depth(kpts0.reshape(b, m * ww, 2), depth0, depth1,
                                T_0to1, K0, K1)
    w_pt0 = jnp.where(v0[..., None], w_pt0, -1e5).reshape(b, m, ww, 2)
    return _fine_label_from_warp(w_pt0, kpts1, window, dist_thr)


def spvs_fine_expec_homography(
    matches: CoarseMatches,
    H_0to1: jax.Array,
    grid_w0: int,
    grid_w1: int,
    coarse_scale: int = 8,
    fine_scale: int = 2,
    window: int = 5,
) -> jax.Array:
    """Soft-argmax GT offsets for the plain-LoFTR family (spvs_fine,
    supervision.py:130-149): normalized offset of the warped coarse center of
    image0 relative to the matched center in image1, in window-radius units.

    Returns expec_f_gt [B, M, 2] (|.| > 1 means "fell outside the window";
    the legacy loss filters those with correct_thr).
    """
    radius = window // 2
    centers0 = match_coords(matches.i_ids, grid_w0, coarse_scale)
    centers1 = match_coords(matches.j_ids, grid_w1, coarse_scale)
    w_pt0 = warp_points(centers0, H_0to1)
    return (w_pt0 - centers1) / (fine_scale * radius)


def _fine_label_from_warp(w_pt0, kpts1, window, dist_thr) -> jax.Array:
    b, m, ww, _ = w_pt0.shape
    d = jnp.sqrt(((w_pt0[:, :, :, None, :] - kpts1[:, :, None, :, :]) ** 2)
                 .sum(-1) + 0.0)                                   # [B,M,WW,WW]
    flat = d.reshape(b, m, ww * ww)
    amin = flat.argmin(-1)
    keep = jax.nn.one_hot(amin, ww * ww, dtype=d.dtype).reshape(b, m, ww, ww)
    d = d * keep
    label = (d <= dist_thr) & (d > 0)
    return label.astype(jnp.float32)
