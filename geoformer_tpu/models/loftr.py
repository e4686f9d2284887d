"""Plain LoFTR model family: the reference pipeline without the GAM.

Re-implementation of the vendored LoFTR (reference:
model/loftr_src/loftr/loftr.py:14-91) kept for model-family parity: backbone
-> PE -> coarse transformer -> single coarse matching pass -> fine window
gather -> fine transformer -> soft-argmax fine matching
(loftr/utils/fine_matching.py:11-80, spatial-expectation decode with
per-match std — no kornia, the dsnt math is inlined).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from geoformer_tpu.config import GeoFormerConfig
from geoformer_tpu.models.backbone import build_backbone
from geoformer_tpu.models.coarse_matching import (
    CoarseMatches,
    coarse_match,
    match_coords,
)
from geoformer_tpu.models.fine import FinePreprocess
from geoformer_tpu.models.position import add_position_encoding
from geoformer_tpu.models.transformer import LocalFeatureTransformer
from geoformer_tpu.ops.matching import dual_softmax


class LoFTROutput(NamedTuple):
    conf: jax.Array        # [B, L0, L1] coarse confidence
    matches: CoarseMatches
    expec_f: jax.Array     # [B, M, 3] normalized offset + std
    mkpts0: jax.Array      # [B, M, 2]
    mkpts1: jax.Array      # [B, M, 2]
    valid: jax.Array       # [B, M]


def soft_argmax_match(feat_w0: jax.Array, feat_w1: jax.Array, window: int):
    """Center-vs-window spatial expectation (fine_matching.py:49-66).

    Args:
        feat_w0/feat_w1: [N, WW, C] window tokens.
    Returns:
        (coords_normalized [N, 2] in [-1, 1], std [N]).
    """
    n, ww, c = feat_w0.shape
    center = feat_w0[:, ww // 2, :]
    sim = jnp.einsum("mc,mrc->mr", center, feat_w1) / jnp.sqrt(
        jnp.asarray(c, feat_w0.dtype))
    heat = jax.nn.softmax(sim, axis=1)                       # [N, WW]

    # normalized grid in [-1, 1] (kornia create_meshgrid(normalized) order)
    ax = jnp.linspace(-1.0, 1.0, window)
    gx, gy = jnp.meshgrid(ax, ax, indexing="xy")
    grid = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)   # [WW, 2]

    coords = jnp.einsum("mr,rk->mk", heat, grid)             # [N, 2]
    var = jnp.einsum("mr,rk->mk", heat, grid ** 2) - coords ** 2
    std = jnp.sqrt(jnp.clip(var, 1e-10)).sum(-1)
    return coords, std


class LoFTR(nn.Module):
    """Reference-shaped LoFTR (no GAM, single coarse pass, s2d fine)."""

    config: GeoFormerConfig = GeoFormerConfig()

    @nn.compact
    def __call__(self, image0, image1, mask0: Optional[jax.Array] = None,
                 mask1: Optional[jax.Array] = None, train: bool = False
                 ) -> LoFTROutput:
        cfg = self.config
        b, H, W, _ = image0.shape
        h0c, w0c = H // cfg.coarse_scale, W // cfg.coarse_scale

        backbone = build_backbone(cfg.backbone,
                             name="backbone")
        feats_c, feats_f = backbone(
            jnp.concatenate([image0, image1], axis=0), train=train)
        cnn_c0, cnn_c1 = feats_c[:b], feats_c[b:]
        feat_f0, feat_f1 = feats_f[:b], feats_f[b:]

        f0 = add_position_encoding(cnn_c0).reshape(b, h0c * w0c, -1)
        f1 = add_position_encoding(cnn_c1).reshape(b, h0c * w0c, -1)
        m0 = mask0.reshape(b, -1) if mask0 is not None else None
        m1 = mask1.reshape(b, -1) if mask1 is not None else None
        f0, f1 = LocalFeatureTransformer(
            cfg.coarse.d_model, cfg.coarse.nhead, cfg.coarse.layer_names,
            cfg.coarse.attention, name="loftr_coarse")(f0, f1, m0, m1)

        matches = coarse_match(
            f0, f1, cfg.match.thr, cfg.match.dsmax_temperature,
            cfg.match.max_matches, m0, m1,
            force_one=cfg.match.force_one_match or train)

        stride = cfg.coarse_scale // cfg.fine_scale
        w0, w1 = FinePreprocess(
            cfg.fine.d_model, cfg.coarse.d_model, cfg.fine_match.window_size,
            cfg.fine_match.concat_coarse_feat, name="fine_preprocess")(
            feat_f0, feat_f1, f0, f1, matches, stride, w0c, w0c)

        m = w0.shape[1]
        ww = cfg.fine_match.window_size ** 2
        t0, t1 = LocalFeatureTransformer(
            cfg.fine.d_model, cfg.fine.nhead, cfg.fine.layer_names,
            cfg.fine.attention, name="loftr_fine")(
            w0.reshape(b * m, ww, -1), w1.reshape(b * m, ww, -1))

        coords, std = soft_argmax_match(t0, t1, cfg.fine_match.window_size)
        coords = coords.reshape(b, m, 2)
        std = std.reshape(b, m)
        expec_f = jnp.concatenate([coords, std[..., None]], -1)

        # decode: mkpts1 = coarse center + coords * (W//2) * fine_scale
        # (fine_matching.py:70-78 with no resize scales)
        centers0 = match_coords(matches.i_ids, w0c, cfg.coarse_scale)
        centers1 = match_coords(matches.j_ids, w0c, cfg.coarse_scale)
        r = cfg.fine_match.window_size // 2
        mkpts1 = centers1 + coords * r * cfg.fine_scale
        return LoFTROutput(matches.conf, matches, expec_f, centers0, mkpts1,
                           matches.valid)
