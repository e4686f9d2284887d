"""Optimizer + LR schedule factory (optax).

Mirrors the reference's AdamW + linear warm-up + MultiStepLR recipe
(reference: loftr_src/optimizers/__init__.py:5-42, warm-up at
lightning/lightning_homo_geoformer.py:47-67, LR scaling at
lightning/train_homo_geoformer.py:80-86): the canonical LR is scaled by
world_batch / canonical_batch, warm-up steps are divided by the same factor.
"""

from __future__ import annotations

import optax

from geoformer_tpu.config import OptimConfig


def make_schedule(cfg: OptimConfig, batch_size: int, steps_per_epoch: int,
                  total_steps: int = 0):
    """Returns (schedule_fn, true_lr, warmup_steps_actual).

    The reference derives warmup in canonical units and divides by the LR
    scaling factor (lightning/train_homo_geoformer.py:80-86) — sane for its
    epoch-scale 64-batch runs, but at small world batch the division blows the
    warmup past short runs entirely (a 6k-step batch-8 run gets a 38.4k-step
    warmup and the peak LR is never reached). When the caller supplies
    `total_steps` and no explicit `warmup_actual` override, the derived warmup
    is clamped to total_steps // 12 so the schedule always reaches true_lr.
    """
    scaling = batch_size / cfg.canonical_bs
    true_lr = cfg.true_lr if cfg.true_lr > 0 else cfg.canonical_lr * scaling
    if cfg.warmup_actual > 0:
        warmup = int(cfg.warmup_actual)
    else:
        warmup = max(1, int(cfg.warmup_steps / max(scaling, 1e-8)))
        if total_steps > 0:
            warmup = min(warmup, max(100, total_steps // 12))

    import math

    def schedule(step):
        """Host-side schedule: plain Python math (the LR reaches the jitted
        step as a runtime scalar, so nothing here needs to be traceable)."""
        step = float(step)
        warm = cfg.warmup_ratio * true_lr + (
            step / warmup) * (1.0 - cfg.warmup_ratio) * true_lr
        base = min(warm, true_lr)
        if cfg.scheduler == "multistep":
            epoch = step // steps_per_epoch
            k = sum(1 for m in cfg.mslr_milestones if epoch >= m)
            decay = cfg.mslr_gamma ** k
        elif cfg.scheduler == "cosine":
            epoch = step / steps_per_epoch
            decay = 0.5 * (1 + math.cos(math.pi * epoch / cfg.cosa_tmax))
        elif cfg.scheduler == "exponential":
            decay = cfg.elr_gamma ** step
        else:
            raise ValueError(cfg.scheduler)
        return base * decay

    return schedule, true_lr, warmup


def make_optimizer(cfg: OptimConfig, batch_size: int, steps_per_epoch: int):
    """Unit-LR optimizer: the train step scales updates by a dynamic LR scalar
    (see trainer.make_train_step), so changing schedule hyperparameters never
    recompiles the step — for AdamW, post-scaling unit-LR updates is exactly
    lr * (m_hat/sqrt(v_hat) + wd * theta)."""
    if cfg.optimizer == "adamw":
        opt = optax.adamw(1.0, weight_decay=cfg.adamw_decay)
    elif cfg.optimizer == "adam":
        opt = optax.adam(1.0)
    else:
        raise ValueError(cfg.optimizer)
    if cfg.gradient_clipping > 0:
        opt = optax.chain(optax.clip_by_global_norm(cfg.gradient_clipping), opt)
    return opt
