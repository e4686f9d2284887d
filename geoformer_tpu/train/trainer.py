"""Data-parallel training step + state (pjit over a jax.sharding.Mesh).

Replaces the reference's Lightning/DDP engine (reference:
lightning/lightning_homo_geoformer.py:17-122, train_homo_geoformer.py:61-133):
gradient synchronization is compiler-inserted (GSPMD) from the batch sharding;
BatchNorm statistics reduce over the global (sharded) batch, giving sync-BN
semantics (the reference sets sync_batchnorm=True) for free.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from geoformer_tpu.config import GeoFormerConfig, TrainConfig
from geoformer_tpu.models import GeoFormer
from geoformer_tpu.train.loss import geo_loss_streaming
from geoformer_tpu.train.optim import make_optimizer
from geoformer_tpu.train.supervision import (
    spvs_coarse_depth_sparse,
    spvs_coarse_homography_sparse,
    spvs_fine_depth,
    spvs_fine_homography,
)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def init_state(model: GeoFormer, tcfg: TrainConfig, rng: jax.Array
               ) -> Tuple[TrainState, optax.GradientTransformation]:
    H, W = tcfg.image_hw
    img = jnp.zeros((1, H, W, 1))
    variables = model.init({"params": rng, "ransac": rng}, img, img,
                           train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt = make_optimizer(tcfg.optim, tcfg.batch_size, tcfg.steps_per_epoch)
    opt_state = opt.init(params)
    return TrainState(params, batch_stats, opt_state,
                      jnp.zeros((), jnp.int32)), opt


def make_train_step(model: GeoFormer, opt: optax.GradientTransformation,
                    tcfg: TrainConfig):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: dict with image0/image1 [B,H,W,1], H_0to1/H_1to0 [B,3,3], and
    optional mask0/mask1 [B,h_c,w_c].
    """
    cfg = model.config
    H, W = tcfg.image_hw
    wc = W // cfg.coarse_scale
    # The streaming coarse loss recomputes the dual-softmax confidence from
    # features; the (rarely used) sinkhorn matcher produces a different
    # confidence and must train through the dense path.
    assert cfg.match.match_type == "dual_softmax", (
        "streaming loss supports dual_softmax only; use geo_loss (dense) "
        "for sinkhorn training")

    def train_step(state: TrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array, lr: jax.Array):
        mask0 = batch.get("mask0")
        mask1 = batch.get("mask1")

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image0"], batch["image1"], mask0=mask0, mask1=mask1,
                train=True, mutable=["batch_stats"],
                rngs={"ransac": rng}, return_feats=True)
            gt_j, gt_valid = spvs_coarse_homography_sparse(
                batch["H_0to1"], batch["H_1to0"], (H, W), cfg.coarse_scale,
                mask0, mask1)
            fine_gt = spvs_fine_homography(
                out.matches, batch["H_0to1"], wc, wc, cfg.coarse_scale,
                cfg.fine_scale, cfg.fine_match.window_size)
            loss, scalars = geo_loss_streaming(
                out.feats, gt_j, gt_valid, out.fine.fine_conf, fine_gt,
                out.matches.valid, tcfg.loss, cfg.match.dsmax_temperature,
                mask0, mask1, sp_axis=cfg.seq_axis)
            scalars["num_inliers"] = out.geo.num_inliers.mean(
            ).astype(jnp.float32)
            scalars["num_matches"] = out.matches.valid.sum(-1).mean(
            ).astype(jnp.float32)
            return loss, (mut.get("batch_stats", state.batch_stats), scalars)

        grads, (batch_stats, scalars) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        # dynamic LR: optimizer runs at unit LR, updates scaled here so that
        # schedule changes never retrace/recompile the step
        updates = jax.tree.map(lambda u: u * lr, updates)
        params = optax.apply_updates(state.params, updates)
        scalars["grad_norm"] = optax.global_norm(grads)
        scalars["lr"] = lr
        return TrainState(params, batch_stats, opt_state, state.step + 1), \
            scalars

    return train_step


def make_val_step(model: GeoFormer, tcfg: TrainConfig):
    """Validation step for homography training: loss without update plus a
    geometric quality metric — mean corner error of a RANSAC fit on the
    predicted matches vs the GT homography (the reference monitors val_loss,
    lightning_homo_geoformer.py:116-118; the corner metric mirrors the
    HPatches protocol)."""
    from geoformer_tpu.geometry.homography import corner_error
    from geoformer_tpu.geometry.ransac import ransac_homography

    cfg = model.config
    H, W = tcfg.image_hw
    wc = W // cfg.coarse_scale

    def val_step(state: TrainState, batch: Dict[str, jax.Array],
                 rng: jax.Array):
        mask0 = batch.get("mask0")
        mask1 = batch.get("mask1")
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image0"], batch["image1"], mask0=mask0, mask1=mask1,
            train=False, return_feats=True, rngs={"ransac": rng})
        gt_j, gt_valid = spvs_coarse_homography_sparse(
            batch["H_0to1"], batch["H_1to0"], (H, W), cfg.coarse_scale,
            mask0, mask1)
        fine_gt = spvs_fine_homography(
            out.matches, batch["H_0to1"], wc, wc, cfg.coarse_scale,
            cfg.fine_scale, cfg.fine_match.window_size)
        loss, scalars = geo_loss_streaming(
            out.feats, gt_j, gt_valid, out.fine.fine_conf, fine_gt,
            out.matches.valid, tcfg.loss, cfg.match.dsmax_temperature,
            mask0, mask1, sp_axis=cfg.seq_axis)
        val = {f"val_{k}": v for k, v in scalars.items()}

        def fit_one(key, mk0, mk1, v):
            fit = ransac_homography(key, mk0, mk1, v, thr=3.0, iters=256,
                                    refine_iters=2)
            return fit["H"], fit["ok"]

        keys = jax.random.split(rng, batch["image0"].shape[0])
        Hs, oks = jax.vmap(fit_one)(keys, out.fine.mkpts0, out.fine.mkpts1,
                                    out.fine.valid)
        errs = jax.vmap(lambda a, b: corner_error(a, b, (H, W)))(
            Hs, batch["H_0to1"])
        errs = jnp.where(oks, errs, jnp.inf)
        val["val_corner_err_median"] = jnp.median(errs)
        val["val_fit_rate"] = oks.mean().astype(jnp.float32)
        val["val_num_matches"] = out.fine.valid.sum(-1).mean(
        ).astype(jnp.float32)
        return val

    return val_step


def make_depth_train_step(model: GeoFormer, opt: optax.GradientTransformation,
                          tcfg: TrainConfig):
    """Depth-supervised (MegaDepth/ScanNet) train step.

    batch: image0/image1 [B,H,W,1], depth0/depth1 [B,Hd,Wd], T_0to1/T_1to0
    [B,4,4], K0/K1 [B,3,3], scale0/scale1 [B,2], mask0/mask1 [B,h_c,w_c].
    Mirrors PL_GeoFormer's training path (reference:
    lightning/lightning_depth_geoformer.py:27-93).
    """
    cfg = model.config
    H, W = tcfg.image_hw
    wc = W // cfg.coarse_scale

    def train_step(state: TrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array, lr: jax.Array):
        mask0 = batch.get("mask0")
        mask1 = batch.get("mask1")

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image0"], batch["image1"], mask0=mask0, mask1=mask1,
                train=True, mutable=["batch_stats"], rngs={"ransac": rng},
                return_feats=True)
            gt_j, gt_valid = spvs_coarse_depth_sparse(
                batch["depth0"], batch["depth1"], batch["T_0to1"],
                batch["T_1to0"], batch["K0"], batch["K1"], (H, W),
                cfg.coarse_scale, mask0, mask1,
                batch.get("scale0"), batch.get("scale1"))
            fine_gt = spvs_fine_depth(
                out.matches, batch["depth0"], batch["depth1"],
                batch["T_0to1"], batch["K0"], batch["K1"], wc, wc,
                cfg.coarse_scale, cfg.fine_scale,
                cfg.fine_match.window_size,
                scale0=batch.get("scale0"), scale1=batch.get("scale1"))
            loss, scalars = geo_loss_streaming(
                out.feats, gt_j, gt_valid, out.fine.fine_conf, fine_gt,
                out.matches.valid, tcfg.loss, cfg.match.dsmax_temperature,
                mask0, mask1, sp_axis=cfg.seq_axis)
            scalars["num_matches"] = out.matches.valid.sum(-1).mean(
            ).astype(jnp.float32)
            return loss, (mut.get("batch_stats", state.batch_stats), scalars)

        grads, (batch_stats, scalars) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        # dynamic LR: optimizer runs at unit LR, updates scaled here so that
        # schedule changes never retrace/recompile the step
        updates = jax.tree.map(lambda u: u * lr, updates)
        params = optax.apply_updates(state.params, updates)
        scalars["grad_norm"] = optax.global_norm(grads)
        scalars["lr"] = lr
        return TrainState(params, batch_stats, opt_state, state.step + 1), \
            scalars

    return train_step


def make_depth_val_step(model: GeoFormer, tcfg: TrainConfig):
    """Validation step for depth-supervised training.

    Mirrors PL_GeoFormer.validation_step (reference:
    lightning/lightning_depth_geoformer.py:95-110,146-160): loss + per-match
    symmetric epipolar errors in ORIGINAL image coordinates. Pose recovery
    (cv2 essential RANSAC) is a host-side metric on the returned match arrays
    — see train/depth_loop.py — so the jitted step stays fixed-shape.

    Returns (scalars, pair_data) where pair_data carries mkpts0/mkpts1
    [B, M, 2] (original resolution), valid [B, M], mconf and epi_errs [B, M].
    """
    from geoformer_tpu.geometry.depth import (
        essential_from_pose,
        symmetric_epipolar_distance,
    )

    cfg = model.config
    H, W = tcfg.image_hw
    wc = W // cfg.coarse_scale

    def val_step(state: TrainState, batch: Dict[str, jax.Array],
                 rng: jax.Array):
        mask0 = batch.get("mask0")
        mask1 = batch.get("mask1")
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image0"], batch["image1"], mask0=mask0, mask1=mask1,
            train=False, return_feats=True, rngs={"ransac": rng})
        gt_j, gt_valid = spvs_coarse_depth_sparse(
            batch["depth0"], batch["depth1"], batch["T_0to1"],
            batch["T_1to0"], batch["K0"], batch["K1"], (H, W),
            cfg.coarse_scale, mask0, mask1,
            batch.get("scale0"), batch.get("scale1"))
        fine_gt = spvs_fine_depth(
            out.matches, batch["depth0"], batch["depth1"],
            batch["T_0to1"], batch["K0"], batch["K1"], wc, wc,
            cfg.coarse_scale, cfg.fine_scale, cfg.fine_match.window_size,
            scale0=batch.get("scale0"), scale1=batch.get("scale1"))
        loss, scalars = geo_loss_streaming(
            out.feats, gt_j, gt_valid, out.fine.fine_conf, fine_gt,
            out.matches.valid, tcfg.loss, cfg.match.dsmax_temperature,
            mask0, mask1, sp_axis=cfg.seq_axis)
        scalars = {f"val_{k}": v for k, v in scalars.items()}
        scalars["val_num_matches"] = out.fine.valid.sum(-1).mean(
        ).astype(jnp.float32)

        b = batch["image0"].shape[0]
        s0 = batch.get("scale0")
        s1 = batch.get("scale1")
        mk0 = out.fine.mkpts0 * (jnp.ones((b, 1, 2)) if s0 is None
                                 else s0[:, None, :])
        mk1 = out.fine.mkpts1 * (jnp.ones((b, 1, 2)) if s1 is None
                                 else s1[:, None, :])
        E = essential_from_pose(batch["T_0to1"])
        epi = jax.vmap(symmetric_epipolar_distance)(
            mk0, mk1, E, batch["K0"], batch["K1"])
        pair_data = {"mkpts0": mk0, "mkpts1": mk1,
                     "valid": out.fine.valid, "mconf": out.fine.mconf,
                     "epi_errs": epi}
        return scalars, pair_data

    return val_step


def shard_train_step(train_step, mesh: Mesh, axis: str = "data"):
    """jit the step with explicit shardings: state replicated, batch sharded
    on its leading axis over the mesh. GSPMD inserts the gradient psum."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
