"""Geometrized Attention Module (GAM) — fully on-device.

Re-design of the reference GeoModule + GeoTransformer
(reference: model/geo_module.py:13-116, model/geo_transformer/transformer.py:
70-147). The reference's defining wart — cv2.findHomography on the CPU in the
middle of the forward pass plus per-sample Python loops — becomes:

  1. batched on-device RANSAC over the first-pass coarse matches
     (geometry/ransac.py, vmapped over the batch),
  2. self layers: masked full attention where the KV set is a fixed-capacity
     gather of the RANSAC-inlier tokens (math-identical to the reference's
     ``feat[mask]`` subset attention since -1e8 fill zeroes masked columns),
  3. cross layers: each coarse cell of one image attends to a 5x5 window of
     coarse cells gathered around its homography-warped position in the other
     image (window_call), with out-of-bounds entries masked.

Per-sample fallbacks match the reference exactly: with no usable homography
(<= 8 matches or degenerate fit) the cross layers are identity and the self
KV set is all first-pass matches; empty KV sets leave features untouched.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from geoformer_tpu.config import GeoModuleConfig
from geoformer_tpu.core.capacity import masked_select_capacity
from geoformer_tpu.geometry.homography import warp_points
from geoformer_tpu.geometry.ransac import ransac_homography
from geoformer_tpu.models.coarse_matching import CoarseMatches, match_coords
from geoformer_tpu.models.position import add_position_encoding
from geoformer_tpu.models.transformer import EncoderLayer


class GeoState(NamedTuple):
    """Per-sample geometric context derived from first-pass matches."""

    H: jax.Array          # [B, 3, 3] image0 -> image1 homography
    has_H: jax.Array      # [B] bool — fit succeeded with > min_matches inputs
    map0: jax.Array       # [B, L0] inlier membership over image0 cells
    map1: jax.Array       # [B, L1] inlier membership over image1 cells
    num_inliers: jax.Array  # [B]


def _build_geo_state(matches: CoarseMatches, key, hw0_c, hw1_c, scale: int,
                     cfg: GeoModuleConfig) -> GeoState:
    """RANSAC on first-pass matches + inlier membership maps
    (reference: geo_module.py:44-96)."""
    b = matches.i_ids.shape[0]
    h0, w0 = hw0_c
    h1, w1 = hw1_c
    l0, l1 = h0 * w0, h1 * w1

    pts0 = match_coords(matches.i_ids, w0, scale)          # [B, M, 2] px
    pts1 = match_coords(matches.j_ids, w1, scale)
    valid = matches.valid

    keys = jax.random.split(key, b)
    fit = jax.vmap(
        lambda k, p0, p1, v: ransac_homography(
            k, p0, p1, v, thr=cfg.ransac_thr, iters=cfg.ransac_iters,
            refine_iters=cfg.refine_iters)
    )(keys, pts0, pts1, valid)

    has_H = fit["ok"] & (valid.sum(-1) > cfg.min_matches)
    # Self-attention membership: RANSAC inliers if H exists, else all matches
    # (geo_module.py:50-52 vs the untouched kps list in the M-is-None branch).
    member = jnp.where(has_H[:, None], fit["inliers"] & valid, valid)

    # Scatter membership onto the coarse grids of both images.
    cell0 = matches.i_ids                                   # row cells
    cell1 = matches.j_ids
    drop0 = jnp.where(member, cell0, l0)
    drop1 = jnp.where(member, cell1, l1)
    map0 = jnp.zeros((b, l0 + 1), bool)
    map1 = jnp.zeros((b, l1 + 1), bool)
    brow = jnp.arange(b)[:, None]
    map0 = map0.at[brow, drop0].set(True)
    map1 = map1.at[brow, drop1].set(True)
    return GeoState(fit["H"], has_H, map0[:, :l0], map1[:, :l1],
                    fit["num_inliers"])


def _window_cells(H: jax.Array, hw_src_c, hw_dst_c, scale: int,
                  window_size: int):
    """Warp the source coarse grid through H and build 5x5 destination-cell
    windows (reference: get_map_keypoints + warp_points_batch + generate_window,
    utils/common_utils.py:65-91,137-144).

    Returns (cells [B, Ls, W*W] int32 linear dst-cell ids, mask [B, Ls, W*W]).
    """
    hs, ws = hw_src_c
    hd, wd = hw_dst_c
    r = window_size // 2
    grid = match_coords(jnp.arange(hs * ws, dtype=jnp.int32), ws, scale)  # px
    warped = warp_points(grid[None], H)                     # [B, Ls, 2] px
    off = jnp.stack(jnp.meshgrid(
        jnp.arange(-r, r + 1, dtype=jnp.float32) * scale,
        jnp.arange(-r, r + 1, dtype=jnp.float32) * scale,
        indexing="xy"), axis=-1).reshape(-1, 2)             # [W*W, 2] (x, y)
    kp = warped[:, :, None, :] + off[None, None]            # [B, Ls, WW, 2]
    in_b = ((kp[..., 0] >= 0) & (kp[..., 0] < wd * scale)
            & (kp[..., 1] >= 0) & (kp[..., 1] < hd * scale))
    kp = jnp.where(in_b[..., None], kp, 0.0)
    cx = jnp.floor(kp[..., 0] / scale).astype(jnp.int32)
    cy = jnp.floor(kp[..., 1] / scale).astype(jnp.int32)
    cx = jnp.clip(cx, 0, wd - 1)
    cy = jnp.clip(cy, 0, hd - 1)
    return cy * wd + cx, in_b


class GeoModule(nn.Module):
    cfg: GeoModuleConfig
    d_model: int
    dtype: jnp.dtype = jnp.float32
    # Sequence-parallel mesh axis (core/spmd.py): token dims stay sharded;
    # the capacity-bounded KV sets and RANSAC state are replicated.
    seq_axis: "str | None" = None

    @nn.compact
    def __call__(self, cnn_feat0, cnn_feat1, matches: CoarseMatches,
                 scale: int, ransac_key):
        """Refine pre-transformer CNN coarse features with geometric attention.

        Args:
            cnn_feat0/1: [B, h, w, C] NHWC coarse CNN features (pre-LoFTR).
            matches: first-pass coarse matches.
            scale: image->coarse stride (8).
            ransac_key: PRNG key for hypothesis sampling.
        Returns:
            (feat0, feat1): [B, L, C] refined token features, plus GeoState.
        """
        cfg = self.cfg
        b, h0, w0, c = cnn_feat0.shape
        _, h1, w1, _ = cnn_feat1.shape

        # The geometric fit is a hard decision, not a differentiable path —
        # the reference runs RANSAC under no_grad on the CPU. stop_gradient
        # also keeps eigh/solve JVP rules out of the compiled train step.
        state = jax.tree.map(
            jax.lax.stop_gradient,
            _build_geo_state(matches, ransac_key, (h0, w0), (h1, w1), scale,
                             cfg))

        from geoformer_tpu.core.spmd import shard_dim

        feat0 = shard_dim(
            add_position_encoding(cnn_feat0).reshape(b, h0 * w0, c),
            self.seq_axis)
        feat1 = shard_dim(
            add_position_encoding(cnn_feat1).reshape(b, h1 * w1, c),
            self.seq_axis)

        # Fixed-capacity compaction of the inlier KV sets (indices are
        # layer-invariant; features are re-gathered every layer).
        idx0, kv_ok0 = jax.vmap(
            lambda m: masked_select_capacity(m, cfg.max_inliers))(state.map0)
        idx1, kv_ok1 = jax.vmap(
            lambda m: masked_select_capacity(m, cfg.max_inliers))(state.map1)
        any0 = state.map0.any(axis=1)
        any1 = state.map1.any(axis=1)

        # Cross-window geometry (recomputed features are gathered per layer;
        # cell geometry is layer-invariant). Samples without a homography get
        # identity geometry — their cross output is discarded by the select
        # below, but NaN-free math keeps gradients clean.
        H = jnp.where(state.has_H[:, None, None], state.H,
                      jnp.eye(3, dtype=state.H.dtype))
        Hinv = jnp.linalg.inv(H)
        # On TPU the cross layers use the gather-free box-mask kernel (each
        # query's 5x5 window == a box mask around its warped center over the
        # full token set); elsewhere, explicit window gathers. The kernel
        # internally switches between a whole-KV-resident forward and a
        # kv-tiled online-softmax forward by VMEM footprint (f32 at S=4800
        # needs 19.1 MB whole-KV vs the 16 MB core limit), so any dtype and
        # resolution compiles.
        # The Pallas box kernel is a single-device custom call; under
        # sequence parallelism the gather-based path partitions cleanly
        # (queries and their windows shard together), so use that instead.
        use_box = (cfg.use_pallas and jax.default_backend() == "tpu"
                   and self.seq_axis is None)
        r = cfg.window_size // 2
        if use_box:
            def centers_of(Hm, hw_src, hw_dst):
                hs, ws = hw_src
                grid = match_coords(
                    jnp.arange(hs * ws, dtype=jnp.int32), ws, scale)
                warped = warp_points(grid[None], Hm)          # [B, Ls, 2] px
                c = jnp.floor(jnp.clip(warped, -1e6, 1e6) / scale)
                return c.astype(jnp.int32)

            centers1 = centers_of(H, (h0, w0), (h1, w1))
            centers0 = centers_of(Hinv, (h1, w1), (h0, w0))
        else:
            cells1, wmask1 = _window_cells(H, (h0, w0), (h1, w1), scale,
                                           cfg.window_size)  # img0 q -> img1
            cells0, wmask0 = _window_cells(Hinv, (h1, w1), (h0, w0), scale,
                                           cfg.window_size)  # img1 q -> img0

        take_tok = jax.vmap(lambda f, i: jnp.take(f, i, axis=0))

        for li, name in enumerate(cfg.layer_names):
            layer = EncoderLayer(self.d_model, cfg.nhead, attention="full",
                                 mlp_act="tanh", dtype=self.dtype,
                                 use_pallas=cfg.use_pallas
                                 and cfg.use_pallas_self,
                                 int8=cfg.int8,
                                 name=f"layer_{li}")
            if name == "self":
                kv0 = take_tok(feat0, idx0)                 # [B, cap, C]
                out0 = layer(feat0, kv0, None, kv_ok0, mask_fill=-1e8)
                feat0 = jnp.where(any0[:, None, None], out0, feat0)
                kv1 = take_tok(feat1, idx1)
                out1 = layer(feat1, kv1, None, kv_ok1, mask_fill=-1e8)
                feat1 = jnp.where(any1[:, None, None], out1, feat1)
            elif name == "cross":
                if use_box:
                    # Gather-free box-mask kernel: projects K/V once per
                    # token set (1/W^2 of the window-projection FLOPs) and
                    # never materializes [B, L, W^2, C] windows in HBM.
                    out0 = layer.box_window_call(feat0, feat1, centers1,
                                                 (h1, w1), r)
                    out1 = layer.box_window_call(feat1, feat0, centers0,
                                                 (h0, w0), r)
                else:
                    # NOTE: measured on v5e, gathering raw features once and
                    # projecting the windows (XLA fuses gather into the
                    # matmul) beats pre-projecting K/V and gathering twice —
                    # 183 vs 240 ms per B=4 forward — despite the 25x
                    # projection-FLOP difference.
                    win1 = take_tok(feat1, cells1.reshape(b, -1)).reshape(
                        b, h0 * w0, cfg.window_size ** 2, c)
                    win0 = take_tok(feat0, cells0.reshape(b, -1)).reshape(
                        b, h1 * w1, cfg.window_size ** 2, c)
                    out0 = layer.window_call(feat0, win1, wmask1)
                    out1 = layer.window_call(feat1, win0, wmask0)
                sel = state.has_H[:, None, None]
                feat0 = jnp.where(sel, out0, feat0)
                feat1 = jnp.where(sel, out1, feat1)
            else:
                raise KeyError(name)
            feat0 = shard_dim(feat0, self.seq_axis)
            feat1 = shard_dim(feat1, self.seq_axis)

        return feat0, feat1, state
