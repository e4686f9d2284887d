"""Self-supervised homography training loop (single-host, multi-device DP).

The TPU-native counterpart of train_homo_geoformer (reference:
lightning/train_homo_geoformer.py:61-133): synthetic homography pairs are
generated on-device (data/synthetic.py), the step is pjit-sharded over the
data axis of the mesh, and metrics/checkpoints stream to jsonl/orbax.
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
from geoformer_tpu.data.synthetic import base_image_stream, make_pair_batch
from geoformer_tpu.models import GeoFormer
from geoformer_tpu.train.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
    save_params,
)
from geoformer_tpu.train.trainer import (
    init_state,
    make_train_step,
    make_val_step,
    shard_train_step,
)


def run_training(
    image_dir: Optional[str] = None,
    steps: int = 1000,
    batch_size: int = 8,
    image_hw: Tuple[int, int] = (480, 640),
    ckpt_dir: str = "checkpoints",
    log_every: int = 50,
    ckpt_every: int = 1000,
    seed: int = 66,
    match_capacity: int = 512,
    model_cfg: Optional[GeoFormerConfig] = None,
    lr: float = 0.0,
    warmup_steps: int = 0,
    resume: bool = False,
    val_every: int = 0,
    tensorboard: bool = False,
    texture_style: str = "mixed",
    image_fraction: float = 1.0,
    log_figures: bool = False,
    sensor_aug: bool = False,
    bank_size: int = 256,
    bank_refresh: int = 0,
):
    devices = np.array(jax.devices())
    mesh = Mesh(devices, ("data",))
    n_dev = len(devices)
    assert batch_size % n_dev == 0, (batch_size, n_dev)

    cfg = model_cfg or GeoFormerConfig(
        match=MatchConfig(max_matches=match_capacity, force_one_match=True),
        geo=GeoModuleConfig(ransac_iters=256, max_inliers=512),
    )
    from geoformer_tpu.config import OptimConfig
    import dataclasses as _dc

    optim = OptimConfig()
    if lr > 0:
        optim = _dc.replace(optim, true_lr=lr)
    if warmup_steps > 0:
        optim = _dc.replace(optim, warmup_actual=warmup_steps)
    tcfg = TrainConfig(batch_size=batch_size, image_hw=image_hw, seed=seed,
                       steps_per_epoch=max(1, steps // 15),
                       optim=optim)
    from geoformer_tpu.train.optim import make_schedule

    schedule, true_lr, warmup_actual = make_schedule(
        tcfg.optim, batch_size, tcfg.steps_per_epoch, total_steps=steps)
    print(f"schedule: true_lr={true_lr:.3e} warmup={warmup_actual} steps "
          f"scheduler={tcfg.optim.scheduler} "
          f"steps_per_epoch={tcfg.steps_per_epoch}")
    model = GeoFormer(cfg)
    key = jax.random.key(seed)
    state, opt = init_state(model, tcfg, key)
    if resume:
        state = restore_checkpoint(ckpt_dir, state, require=True)
        print(f"resumed at step {int(state.step)}")
    step_fn = shard_train_step(make_train_step(model, opt, tcfg), mesh)
    val_fn = jax.jit(make_val_step(model, tcfg)) if val_every else None

    data_sh = NamedSharding(mesh, P("data"))
    # Fold the resume step into the data seeds: otherwise a resumed run
    # replays the exact batches already trained on (stream + pair keys
    # restart from the same seeds).
    data_seed = seed + 1_000_003 * int(state.step)
    stream = base_image_stream(image_hw, batch_size, data_seed, image_dir,
                               texture_style=texture_style,
                               image_fraction=image_fraction,
                               bank_size=bank_size,
                               bank_refresh=bank_refresh)
    pair_key = jax.random.key(data_seed + 1)
    ransac_key = jax.random.key(data_seed + 2)
    # held-out validation batch from a disjoint seed
    if val_every:
        val_stream = base_image_stream(image_hw, batch_size, seed + 9999,
                                       image_dir,
                                       texture_style=texture_style,
                                       image_fraction=image_fraction)
        val_base = jnp.asarray(next(val_stream))
        val_batch = make_pair_batch(val_base, jax.random.key(seed + 777),
                                    sensor=sensor_aug)

    tb = None
    if tensorboard:
        from tensorboardX import SummaryWriter

        tb = SummaryWriter(os.path.join(ckpt_dir, "tb"))

    # Optional match-figure logging at each validation step (the reference
    # logs matching figures from its PL validation loop; here it is opt-in
    # because the inference forward is one extra compile over the tunnel).
    fig_fwd = None
    if tb is not None and log_figures and val_every:
        @jax.jit
        def fig_fwd(st, vb):
            return model.apply(
                {"params": st.params, "batch_stats": st.batch_stats},
                vb["image0"], vb["image1"],
                rngs={"ransac": jax.random.key(0)})

    os.makedirs(ckpt_dir, exist_ok=True)
    metrics_path = os.path.join(ckpt_dir, "metrics.jsonl")
    t0 = time.time()
    last = t0
    start_step = int(state.step)
    with open(metrics_path, "a") as mf:
        for step in range(start_step, steps):
            base = jax.device_put(jnp.asarray(next(stream)), data_sh)
            pair_key, k1 = jax.random.split(pair_key)
            ransac_key, k2 = jax.random.split(ransac_key)
            batch = make_pair_batch(base, k1, sensor=sensor_aug)
            lr_now = jnp.asarray(float(schedule(step)), jnp.float32)
            state, metrics = step_fn(state, batch, k2, lr_now)
            if (step + 1) % log_every == 0 or step == 0:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                now = time.time()
                m.update(step=step + 1,
                         imgs_per_s=batch_size * log_every / (now - last)
                         if step else batch_size / (now - t0))
                last = now
                print(json.dumps(m))
                mf.write(json.dumps(m) + "\n")
                mf.flush()
                if tb is not None:
                    for k, v in m.items():
                        if k != "step":
                            tb.add_scalar(k, v, step + 1)
            if val_fn is not None and (step + 1) % val_every == 0:
                vm = {k: float(v) for k, v in jax.device_get(
                    val_fn(state, val_batch, jax.random.key(0))).items()}
                vm["step"] = step + 1
                print(json.dumps(vm))
                mf.write(json.dumps(vm) + "\n")
                mf.flush()
                if tb is not None:
                    for k, v in vm.items():
                        if k != "step":
                            tb.add_scalar(k, v, step + 1)
                if fig_fwd is not None:
                    from geoformer_tpu.utils.plotting import (
                        log_val_match_figure,
                    )

                    log_val_match_figure(tb, fig_fwd(state, val_batch),
                                         val_batch, step + 1)
            if (step + 1) % ckpt_every == 0 or step + 1 == steps:
                save_checkpoint(ckpt_dir, jax.device_get(state), step + 1)

    save_params(os.path.join(ckpt_dir, "params_final.npz"), {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "step": int(state.step),
    })
    return state
