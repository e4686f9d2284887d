"""GeoLoss: focal coarse loss (x2 passes) + BCE fine loss.

Re-derivation of GeoLoss (reference: model/loftr_src/losses/loftr_loss.py:
195-395) with masked means instead of boolean indexing (fixed shapes). The
reference's DDP-deadlock dummies (empty pos/neg fallbacks) become natural
zero-weight masked means.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from geoformer_tpu.config import LossConfig


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    w = mask.astype(x.dtype)
    return (x * w).sum() / jnp.maximum(w.sum(), 1.0)


def coarse_loss(conf: jax.Array, conf_gt: jax.Array, cfg: LossConfig,
                weight: Optional[jax.Array] = None) -> jax.Array:
    """Focal (or CE) loss on the dual-softmax confidence.

    With sparse_spvs (reference default for dual_softmax) only positive cells
    are supervised (loftr_loss.py:246-276); dense mode adds the negative term.
    """
    conf = jnp.clip(conf, 1e-6, 1 - 1e-6)
    pos = conf_gt == 1.0
    neg = conf_gt == 0.0
    if weight is not None:
        pos = pos & (weight > 0)
        neg = neg & (weight > 0)

    if cfg.coarse_type == "cross_entropy":
        lp = -jnp.log(conf)
        ln = -jnp.log(1 - conf)
        return (cfg.pos_weight * _masked_mean(lp, pos)
                + cfg.neg_weight * _masked_mean(ln, neg))

    a, g = cfg.focal_alpha, cfg.focal_gamma
    lp = -a * (1 - conf) ** g * jnp.log(conf)
    if cfg.sparse_spvs:
        return cfg.pos_weight * _masked_mean(lp, pos)
    ln = -a * conf ** g * jnp.log(1 - conf)
    return (cfg.pos_weight * _masked_mean(lp, pos)
            + cfg.neg_weight * _masked_mean(ln, neg))


def fine_loss(fine_conf: jax.Array, label: jax.Array, valid: jax.Array,
              cfg: LossConfig) -> jax.Array:
    """Element-wise BCE on the fine window confidence
    (loftr_loss.py:286-296), restricted to valid match slots."""
    conf = jnp.clip(fine_conf, 1e-6, 1 - 1e-6)
    v = valid[:, :, None, None]
    pos = (label == 1.0) & v
    neg = (label == 0.0) & v
    lp = _masked_mean(-jnp.log(conf), pos)
    ln = _masked_mean(-jnp.log(1 - conf), neg)
    has_pos = pos.any()
    has_neg = neg.any()
    # NaN guards of the reference: fall back to the defined half.
    loss = cfg.pos_weight * jnp.where(has_pos, lp, 0.0) \
        + cfg.neg_weight * jnp.where(has_neg, ln, 0.0)
    return loss


def fine_loss_l2_std(expec_f: jax.Array, expec_f_gt: jax.Array,
                     valid: jax.Array, correct_thr: float = 1.0,
                     training: bool = True) -> jax.Array:
    """Legacy LoFTR fine loss: std-weighted l2 on normalized offsets
    (loftr_loss.py:316-343) for the soft-argmax (plain LoFTR) family.

    expec_f: [B, M, 3] (x, y, std); expec_f_gt: [B, M, 2]; valid: [B, M].
    """
    correct = (jnp.abs(expec_f_gt).max(-1) < correct_thr) & valid
    std = expec_f[..., 2]
    inv_std = 1.0 / jnp.clip(std, 1e-10)
    weight = jax.lax.stop_gradient(
        inv_std / jnp.maximum(_masked_mean(inv_std, valid), 1e-10))
    l2 = ((expec_f_gt - expec_f[..., :2]) ** 2).sum(-1)
    return _masked_mean(l2 * weight, correct)


def geo_loss(
    conf: jax.Array,
    dect_conf: jax.Array,
    conf_gt: jax.Array,
    fine_conf: jax.Array,
    fine_gt: jax.Array,
    fine_valid: jax.Array,
    cfg: LossConfig,
    mask0: Optional[jax.Array] = None,
    mask1: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Total loss = (focal(conf) + focal(dect_conf)) * w_c + bce(fine) * w_f
    (loftr_loss.py:366-384)."""
    weight = None
    if mask0 is not None and mask1 is not None:
        b = conf.shape[0]
        weight = (mask0.reshape(b, -1, 1) * mask1.reshape(b, 1, -1))
    lc = coarse_loss(conf, conf_gt, cfg, weight)
    ld = coarse_loss(dect_conf, conf_gt, cfg, weight)
    lf = fine_loss(fine_conf, fine_gt, fine_valid, cfg)
    total = (lc + ld) * cfg.coarse_weight + lf * cfg.fine_weight
    return total, {"loss_c": lc, "loss_d": ld, "loss_f": lf, "loss": total}


def geo_loss_streaming(
    feats,
    gt_j: jax.Array,
    gt_valid: jax.Array,
    fine_conf: jax.Array,
    fine_gt: jax.Array,
    fine_valid: jax.Array,
    cfg: LossConfig,
    temperature: float = 0.1,
    mask0: Optional[jax.Array] = None,
    mask1: Optional[jax.Array] = None,
    sp_axis: Optional[str] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """geo_loss computed from coarse features + sparse GT without ever
    materializing a [B, L, L] confidence or GT matrix (ops/fused_loss.py).
    Value/gradient-equivalent to geo_loss(dense) — tests/test_fused_loss.py.

    feats: (f0, f1, g0, g1) from MatchOutput.feats (return_feats=True).
    sp_axis: sequence-parallel mesh axis — the coarse terms run row-sharded
    under shard_map with psum'd reductions (value/grad-equivalent; enables
    high-resolution SP *training*, docs/SCALING.md). The fine term is
    capacity-bounded and stays replicated.
    """
    from geoformer_tpu.ops.fused_loss import streaming_coarse_loss

    f0, f1, g0, g1 = feats

    if sp_axis is None:
        def coarse(a, b):
            return streaming_coarse_loss(a, b, gt_j, gt_valid, cfg,
                                         temperature, mask0, mask1)
    else:
        import jax as _jax
        from jax.sharding import PartitionSpec as P

        bsz, l0 = gt_j.shape
        m0 = jnp.ones((bsz, l0), jnp.float32) if mask0 is None \
            else mask0.reshape(bsz, l0)
        m1 = jnp.ones((bsz, f1.shape[1]), jnp.float32) if mask1 is None \
            else mask1.reshape(bsz, f1.shape[1])

        def coarse(a, b):
            return _jax.shard_map(
                lambda fa, fb, gj, gv, ma, mb: streaming_coarse_loss(
                    fa, fb, gj, gv, cfg, temperature, ma, mb,
                    axis_name=sp_axis),
                in_specs=(P(None, sp_axis, None), P(None, sp_axis, None),
                          P(None, sp_axis), P(None, sp_axis),
                          P(None, sp_axis), P(None, sp_axis)),
                out_specs=P(),
                axis_names=frozenset({sp_axis}),
            )(a, b, gt_j, gt_valid, m0, m1)

    lc = coarse(g0, g1)
    ld = coarse(f0, f1)
    lf = fine_loss(fine_conf, fine_gt, fine_valid, cfg)
    total = (lc + ld) * cfg.coarse_weight + lf * cfg.fine_weight
    return total, {"loss_c": lc, "loss_d": ld, "loss_f": lf, "loss": total}
