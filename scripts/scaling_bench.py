"""Data-parallel scaling efficiency rig.

Measures train-step throughput at 1, 2, 4, ... devices on the available mesh
(virtual CPU devices stand in for a pod slice when only one real chip is
attached). Reports images/s and scaling efficiency vs the single-device run —
the measurement the BASELINE north star asks for (>=80% 1 host -> N hosts).

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py --height 64 --width 80 --steps 5
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

from geoformer_tpu.core.platform import respect_platform_env

respect_platform_env()

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from geoformer_tpu.config import (
    GeoFormerConfig,
    GeoModuleConfig,
    MatchConfig,
    TrainConfig,
)
from geoformer_tpu.data.synthetic import make_pair_batch
from geoformer_tpu.models import GeoFormer
from geoformer_tpu.train.trainer import (
    init_state,
    make_train_step,
    shard_train_step,
)


def run(n_dev, hw, steps, per_device_batch=1):
    devices = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devices, ("data",))
    batch_size = n_dev * per_device_batch
    cfg = GeoFormerConfig(
        match=MatchConfig(max_matches=64, force_one_match=True),
        geo=GeoModuleConfig(ransac_iters=64, max_inliers=64),
    )
    tcfg = TrainConfig(batch_size=batch_size, image_hw=hw, steps_per_epoch=10)
    model = GeoFormer(cfg)
    state, opt = init_state(model, tcfg, jax.random.key(0))
    step = shard_train_step(make_train_step(model, opt, tcfg), mesh)

    base = jnp.asarray(
        np.random.default_rng(0).random((batch_size, *hw), np.float32))
    lr = jnp.asarray(1e-4)
    batch = make_pair_batch(base, jax.random.key(1))
    state, m = step(state, batch, jax.random.key(2), lr)   # compile
    jax.block_until_ready(m)
    float(m["loss"])

    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(state, batch, jax.random.key(3 + i), lr)
    float(m["loss"])
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=80)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()
    hw = (args.height, args.width)

    n = len(jax.devices())
    sizes = [s for s in (1, 2, 4, 8, 16) if s <= n]
    base_rate = None
    out = {}
    for s in sizes:
        rate = run(s, hw, args.steps)
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * s)
        out[s] = {"imgs_per_s": round(rate, 3), "efficiency": round(eff, 3)}
        print(json.dumps({"devices": s, **out[s]}))


if __name__ == "__main__":
    main()
