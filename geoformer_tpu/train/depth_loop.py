"""Depth-supervised (MegaDepth/ScanNet) training loop with pose-AUC
validation.

The TPU-native counterpart of train_depth_geoformer + PL_GeoFormer
(reference: lightning/train_depth_geoformer.py:61-133,
lightning/lightning_depth_geoformer.py:27-207): scene-balanced npz batches,
a pjit-sharded depth train step, validation that recovers relative pose per
pair (essential RANSAC on the host over device-computed matches), cross-host
metric aggregation, and top-5 checkpoints monitored by auc@10.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from geoformer_tpu.config import (
    GeoFormerConfig,
    GeoModuleConfig,
    MatchConfig,
    TrainConfig,
)
from geoformer_tpu.core.dist import all_gather_metrics
from geoformer_tpu.data.megadepth import scene_balanced_stream
from geoformer_tpu.eval.pose import pose_error_for_pair
from geoformer_tpu.train.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
    save_checkpoint_monitored,
    save_params,
)
from geoformer_tpu.train.trainer import (
    init_state,
    make_depth_train_step,
    make_depth_val_step,
    shard_train_step,
)


def run_depth_validation(val_fn, state, val_batches, rng_key,
                         epi_err_thr: float = 5e-4,
                         pose_thresh: float = 0.5,
                         pose_backend: str = "device") -> dict:
    """One validation sweep: device step per batch, essential-RANSAC pose
    recovery per pair, cross-host gather, AUC aggregation.

    Mirrors PL_GeoFormer.validation_epoch_end (reference:
    lightning_depth_geoformer.py:162-207 -> comm.py all_gather ->
    metrics.py:173-193 aggregate_metrics).

    pose_backend: "device" runs the jitted batched 8-point RANSAC
    (geometry/essential.py) so the whole val step stays on-chip; "host"
    keeps the reference-faithful per-pair cv2 loop (metrics.py:72-98).
    Pose-AUC parity between the two is cross-tested in tests/test_pose.py.
    """
    R_errs, t_errs, epi_lists, identifiers, val_scalars = [], [], [], [], []
    pair_id = jax.process_index() * 10 ** 9
    for batch in val_batches:
        scalars, pd = val_fn(state, batch, rng_key)
        val_scalars.append({k: float(v) for k, v in
                            jax.device_get(scalars).items()})
        if pose_backend == "device":
            from geoformer_tpu.geometry.essential import batched_pose_errors

            t_e, R_e, _, _ = batched_pose_errors(
                jax.random.key(0), jnp.asarray(pd["mkpts0"]),
                jnp.asarray(pd["mkpts1"]), jnp.asarray(pd["valid"]),
                jnp.asarray(batch["K0"]), jnp.asarray(batch["K1"]),
                jnp.asarray(batch["T_0to1"]), thresh=pose_thresh)
            t_e = np.asarray(t_e)
            R_e = np.asarray(R_e)
            pd = jax.device_get(pd)
            for i in range(pd["valid"].shape[0]):
                R_errs.append(float(R_e[i]))
                t_errs.append(float(t_e[i]))
                epi_lists.append(pd["epi_errs"][i][pd["valid"][i]])
                identifiers.append(pair_id)
                pair_id += 1
            continue
        pd = jax.device_get(pd)
        K0 = np.asarray(batch["K0"])
        K1 = np.asarray(batch["K1"])
        T = np.asarray(batch["T_0to1"])
        for i in range(pd["valid"].shape[0]):
            v = pd["valid"][i]
            mk0 = pd["mkpts0"][i][v]
            mk1 = pd["mkpts1"][i][v]
            t_err, R_err, _ = pose_error_for_pair(
                mk0, mk1, K0[i], K1[i], T[i], thresh=pose_thresh)
            R_errs.append(R_err)
            t_errs.append(t_err)
            epi_lists.append(pd["epi_errs"][i][v])
            identifiers.append(pair_id)
            pair_id += 1

    # fixed-shape cross-host gather (core/dist.py): scalars concatenate on
    # the leading axis; the ragged epi lists aggregate to per-pair precision
    # first, matching the reference's per-pair precision mean
    prec = np.asarray([float(np.mean(e < epi_err_thr)) if len(e) else 0.0
                       for e in epi_lists], np.float32)
    gathered = all_gather_metrics({
        "R_errs": np.asarray(R_errs, np.float32),
        "t_errs": np.asarray(t_errs, np.float32),
        "prec": prec,
        "identifiers": np.asarray(identifiers, np.int64),
    })
    # dedup by pair id (DDP-duplicate filter semantics, metrics.py:180-182),
    # max(R, t) angular error -> AUC, mean per-pair epipolar precision
    from geoformer_tpu.eval.pose import error_auc

    ids = gathered["identifiers"]
    _, keep = np.unique(ids, return_index=True)
    pose_errs = np.maximum(gathered["R_errs"][keep], gathered["t_errs"][keep])
    agg = error_auc(pose_errs, (5, 10, 20))
    agg[f"prec@{epi_err_thr:.0e}"] = (
        float(np.mean(gathered["prec"][keep])) if len(keep) else 0.0)
    for k in val_scalars[0]:
        agg[k] = float(np.mean([s[k] for s in val_scalars]))
    return agg


def run_depth_training(
    npz_dir: str,
    root_dir: str,
    val_npz_dir: Optional[str] = None,
    steps: int = 1000,
    batch_size: int = 2,
    image_hw: Tuple[int, int] = (640, 640),
    ckpt_dir: str = "checkpoints_depth",
    log_every: int = 50,
    ckpt_every: int = 1000,
    val_every: int = 500,
    n_val_batches: int = 8,
    seed: int = 66,
    match_capacity: int = 512,
    model_cfg: Optional[GeoFormerConfig] = None,
    lr: float = 0.0,
    resume: bool = False,
    min_overlap_score: float = 0.4,
    depth_pad: int = 2000,
):
    """Main depth-supervised training entry (CLI: train-depth)."""
    # use the largest device count that divides the global batch (a tiny
    # debug batch on a large mesh just leaves trailing devices idle)
    n_dev = max(n for n in range(1, len(jax.devices()) + 1)
                if batch_size % n == 0)
    devices = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devices, ("data",))

    cfg = model_cfg or GeoFormerConfig(
        match=MatchConfig(max_matches=match_capacity, force_one_match=True),
        geo=GeoModuleConfig(ransac_iters=256, max_inliers=512),
    )
    from geoformer_tpu.config import OptimConfig
    import dataclasses as _dc

    optim = OptimConfig()
    if lr > 0:
        optim = _dc.replace(optim, true_lr=lr)
    tcfg = TrainConfig(batch_size=batch_size, image_hw=image_hw, seed=seed,
                       steps_per_epoch=max(1, steps // 15), optim=optim)
    from geoformer_tpu.train.optim import make_schedule

    schedule, true_lr, warmup_actual = make_schedule(
        tcfg.optim, batch_size, tcfg.steps_per_epoch, total_steps=steps)
    print(f"schedule: true_lr={true_lr:.3e} warmup={warmup_actual} steps")
    model = __import__("geoformer_tpu.models",
                       fromlist=["GeoFormer"]).GeoFormer(cfg)
    state, opt = init_state(model, tcfg, jax.random.key(seed))
    if resume:
        state = restore_checkpoint(ckpt_dir, state, require=True)
        print(f"resumed at step {int(state.step)}")
    step_fn = shard_train_step(make_depth_train_step(model, opt, tcfg), mesh)
    val_fn = jax.jit(make_depth_val_step(model, tcfg))

    shard = (jax.process_index(), jax.process_count())
    scene_kw = dict(min_overlap_score=min_overlap_score,
                    img_resize=image_hw[0], depth_pad=depth_pad)
    stream = scene_balanced_stream(npz_dir, root_dir, batch_size, seed,
                                   shard=shard, **scene_kw)
    val_batches = []
    if val_npz_dir:
        val_stream = scene_balanced_stream(
            val_npz_dir, root_dir, batch_size, seed + 1, shard=shard,
            **scene_kw)
        val_batches = [
            {k: jnp.asarray(v) for k, v in next(val_stream).items()}
            for _ in range(n_val_batches)]

    data_sh = NamedSharding(mesh, P("data"))
    os.makedirs(ckpt_dir, exist_ok=True)
    metrics_path = os.path.join(ckpt_dir, "metrics.jsonl")
    ransac_key = jax.random.key(seed + 2)
    t0 = time.time()
    last = t0
    start_step = int(state.step)
    best = {"auc@10": -1.0}
    with open(metrics_path, "a") as mf:

        def log(m):
            print(json.dumps(m))
            mf.write(json.dumps(m) + "\n")
            mf.flush()

        for step in range(start_step, steps):
            batch = {k: jax.device_put(jnp.asarray(v), data_sh)
                     for k, v in next(stream).items()}
            ransac_key, k2 = jax.random.split(ransac_key)
            lr_now = jnp.asarray(float(schedule(step)), jnp.float32)
            state, metrics = step_fn(state, batch, k2, lr_now)
            if (step + 1) % log_every == 0 or step == 0:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                now = time.time()
                m.update(step=step + 1,
                         imgs_per_s=batch_size * log_every / (now - last)
                         if step else batch_size / (now - t0))
                last = now
                log(m)
            run_val = val_batches and (
                (step + 1) % val_every == 0 or step + 1 == steps)
            # Two retention policies, two directories: the top-k-by-auc@10
            # manager (ckpt_dir/best, Lightning save_top_k semantics) deletes
            # steps the moment five better ones exist, so --resume must NOT
            # read it — a late-but-worse step would silently roll training
            # back. The plain rolling "latest" in ckpt_dir is what
            # restore_checkpoint reads.
            if run_val:
                agg = run_depth_validation(val_fn, state, val_batches,
                                           jax.random.key(0))
                agg["step"] = step + 1
                log(agg)
                host_state = jax.device_get(state)
                save_checkpoint(ckpt_dir, host_state, step + 1, keep=3)
                save_checkpoint_monitored(os.path.join(ckpt_dir, "best"),
                                          host_state, step + 1, agg,
                                          monitor="auc@10")
                if agg["auc@10"] > best["auc@10"]:
                    best = agg
            elif (step + 1) % ckpt_every == 0 or step + 1 == steps:
                save_checkpoint(ckpt_dir, jax.device_get(state), step + 1,
                                keep=3)

    if jax.process_index() == 0:
        save_params(os.path.join(ckpt_dir, "params_final.npz"), {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        })
    return state, best
