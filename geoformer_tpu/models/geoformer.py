"""Full GeoFormer model (flax.linen).

Orchestrates the pipeline of the reference's GeoFormer.forward
(reference: model/full_model.py:39-123):

    backbone -> sine PE -> coarse LoFTR -> coarse match (pass 1)
    -> GAM (on-device RANSAC + geometry-restricted attention)
    -> coarse match (pass 2) -> fine window gather -> fine LoFTR
    -> fine dual-softmax decode

The reference's dict-as-bus is replaced by typed pytrees (CoarseMatches /
FineMatches / MatchOutput) with static capacities; both images must share a
static shape (the batched-backbone path of full_model.py:55-59 — resolution
bucketing with padding masks handles mixed aspect ratios).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from geoformer_tpu.config import GeoFormerConfig
from geoformer_tpu.core.spmd import shard_dim
from geoformer_tpu.models.backbone import build_backbone
from geoformer_tpu.models.coarse_matching import CoarseMatches, coarse_match
from geoformer_tpu.models.fine import (
    FineMatches,
    FinePreprocess,
    fine_matching,
)
from geoformer_tpu.models.geo_module import GeoModule, GeoState
from geoformer_tpu.models.position import add_position_encoding
from geoformer_tpu.models.transformer import LocalFeatureTransformer
from geoformer_tpu.ops.matching import dual_softmax


class MatchOutput(NamedTuple):
    dect_conf: jax.Array        # [B, L0, L1] first-pass coarse confidence
    conf: jax.Array             # [B, L0, L1] second-pass coarse confidence
    matches: CoarseMatches      # second-pass matches (drives the fine stage)
    fine: FineMatches           # final matches + fine confidence
    geo: GeoState               # RANSAC state (H, inlier stats)
    # (f0, f1, g0, g1): coarse features before/after the GAM, for the
    # streaming loss (ops/fused_loss.py) — empty unless return_feats=True.
    feats: Tuple[jax.Array, jax.Array, jax.Array, jax.Array] = ()


class GeoFormer(nn.Module):
    config: GeoFormerConfig = GeoFormerConfig()

    @nn.compact
    def __call__(
        self,
        image0: jax.Array,
        image1: jax.Array,
        mask0: Optional[jax.Array] = None,
        mask1: Optional[jax.Array] = None,
        train: bool = False,
        return_conf: Optional[bool] = None,
        return_feats: bool = False,
    ) -> MatchOutput:
        """
        Args:
            image0/1: [B, H, W, 1] grayscale in [0, 1]; same static shape.
            mask0/1: [B, H/8, W/8] coarse-resolution validity masks (padding).
            train: BatchNorm mode + force-one-match behaviour.
            return_conf: include the dense [B, L, L] coarse confidence
                matrices in the output (needed for the loss; ~370 MB each at
                640px, so inference defaults to False and XLA fuses the
                softmaxes straight into match extraction).
        """
        cfg = self.config
        b, H, W, _ = image0.shape
        h0c, w0c = H // cfg.coarse_scale, W // cfg.coarse_scale
        h1c, w1c = h0c, w0c
        dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32

        # 1. Shared backbone on the concatenated pair (full_model.py:55-59).
        assert tuple(cfg.backbone.resolution) == \
            (cfg.coarse_scale, cfg.fine_scale), \
            (cfg.backbone.resolution, cfg.coarse_scale, cfg.fine_scale)
        backbone = build_backbone(cfg.backbone, dtype=dtype, name="backbone")
        sp = cfg.seq_axis  # sequence-parallel mesh axis (None = replicated)
        feats_c, feats_f = backbone(
            shard_dim(jnp.concatenate([image0, image1], axis=0), sp),
            train=train)
        # Under sequence parallelism the backbone partitions spatially (H);
        # GSPMD inserts the conv halo exchanges.
        feats_c, feats_f = shard_dim(feats_c, sp), shard_dim(feats_f, sp)
        cnn_c0, cnn_c1 = feats_c[:b], feats_c[b:]          # [B, h/8, w/8, 256]
        feat_f0, feat_f1 = feats_f[:b], feats_f[b:]        # [B, h/2, w/2, 128]

        # 2. Positional encoding + coarse transformer over flat tokens.
        f0 = shard_dim(add_position_encoding(cnn_c0).reshape(
            b, h0c * w0c, -1), sp)
        f1 = shard_dim(add_position_encoding(cnn_c1).reshape(
            b, h1c * w1c, -1), sp)
        m0 = mask0.reshape(b, -1) if mask0 is not None else None
        m1 = mask1.reshape(b, -1) if mask1 is not None else None
        assert not (train and (cfg.backbone.int8 or cfg.coarse.int8
                               or cfg.fine.int8 or cfg.geo.int8)), \
            "int8 paths are eval-only (round() has no gradient)"
        coarse_tf = LocalFeatureTransformer(
            cfg.coarse.d_model, cfg.coarse.nhead, cfg.coarse.layer_names,
            cfg.coarse.attention, dtype=dtype, int8=cfg.coarse.int8,
            name="loftr_coarse")
        # Token-sharded coarse transformer: linear attention's KV / Ksum
        # contractions over the sharded token dim become one psum each.
        f0, f1 = coarse_tf(f0, f1, m0, m1)
        f0, f1 = shard_dim(f0, sp), shard_dim(f1, sp)

        force_one = cfg.match.force_one_match or train
        if return_conf is None:
            # Training defaults to the streaming loss over features; the
            # dense [B, L, L] conf matrices are only ever materialized when
            # explicitly requested (dense loss path / tests / debugging).
            return_conf = False
        # Streamed extraction never builds the [B, L, L] conf matrix at all —
        # usable whenever the dense matrix isn't requested downstream.
        streaming = cfg.match.streaming_extract and not return_conf
        if sp is not None:
            assert streaming and cfg.match.match_type != "sinkhorn", (
                "seq_axis requires streaming extraction (no dense [L, L] "
                "matrices exist to shard)")

        if cfg.match.match_type == "sinkhorn":
            # optional OT matcher with learnable dustbin score
            # (reference: coarse_matching.py:42-50 sinkhorn branch)
            from geoformer_tpu.models.coarse_matching import extract_matches
            from geoformer_tpu.ops.sinkhorn import log_optimal_transport

            bin_score = self.param("bin_score", lambda _: jnp.asarray(
                cfg.match.skh_init_bin_score))

            def matcher(a, bfeat):
                c = a.shape[-1]
                sim = jnp.einsum("blc,bsc->bls", a / c ** 0.5,
                                 bfeat / c ** 0.5) / cfg.match.dsmax_temperature
                if m0 is not None and m1 is not None:
                    vm = m0[:, :, None].astype(bool) & \
                        m1[:, None, :].astype(bool)
                    sim = jnp.where(vm, sim, -1e9)
                Z = log_optimal_transport(sim, bin_score, cfg.match.skh_iters)
                conf = jnp.exp(Z)[:, :-1, :-1]
                return extract_matches(conf, cfg.match.thr,
                                       cfg.match.max_matches, force_one,
                                       m0, m1)
        else:
            matcher = lambda a, bfeat: coarse_match(  # noqa: E731
                a, bfeat, cfg.match.thr, cfg.match.dsmax_temperature,
                cfg.match.max_matches, m0, m1, force_one=force_one,
                streaming=streaming, sp_axis=sp)

        # 3. First coarse matching pass.
        matches1 = matcher(f0, f1)

        # 4. GAM on the pre-transformer CNN features (full_model.py:87-89).
        geo = GeoModule(cfg.geo, cfg.coarse.d_model, dtype=dtype,
                        seq_axis=sp, name="geo_module")
        g0, g1, geo_state = geo(cnn_c0, cnn_c1, matches1, cfg.coarse_scale,
                                self.make_rng("ransac"))
        g0, g1 = shard_dim(g0, sp), shard_dim(g1, sp)

        # 5. Second coarse matching pass on the geometrized features.
        matches2 = matcher(g0, g1)

        # 6. Fine stage.
        stride = cfg.coarse_scale // cfg.fine_scale
        pre = FinePreprocess(cfg.fine.d_model, cfg.coarse.d_model,
                             cfg.fine_match.window_size,
                             cfg.fine_match.concat_coarse_feat, dtype=dtype,
                             name="fine_preprocess")
        w0, w1 = pre(feat_f0, feat_f1, g0, g1, matches2, stride, w0c, w1c)

        m = w0.shape[1]
        ww = cfg.fine_match.window_size ** 2
        fine_tf = LocalFeatureTransformer(
            cfg.fine.d_model, cfg.fine.nhead, cfg.fine.layer_names,
            cfg.fine.attention, dtype=dtype, int8=cfg.fine.int8,
            name="loftr_fine")
        t0, t1 = fine_tf(w0.reshape(b * m, ww, -1), w1.reshape(b * m, ww, -1))

        fine_conf = dual_softmax(t0, t1, cfg.fine_match.temperature)
        fine_conf = fine_conf.reshape(b, m, ww, ww)
        fine = fine_matching(fine_conf, matches2, w0c, w1c, cfg.coarse_scale,
                             cfg.fine_scale, cfg.fine_match.window_size,
                             cfg.fine_match.thr)

        empty = jnp.zeros((b, 0, 0), f0.dtype)
        dect_conf = matches1.conf if return_conf else empty
        conf = matches2.conf if return_conf else empty
        matches_out = matches2._replace(conf=conf)
        feats = (f0, f1, g0, g1) if return_feats else \
            (empty, empty, empty, empty)
        return MatchOutput(dect_conf, conf, matches_out, fine, geo_state,
                           feats)
