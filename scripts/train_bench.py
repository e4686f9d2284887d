"""Train-step throughput benchmark (imgs/s) on the current accelerator.

Measures the full homography-supervised train step (fwd+bwd+update) at the
production config — the number VERDICT round-1 pegged at 11.3 imgs/s with
the dense-conf loss. Run in ONE process (axon tunnel is single-client).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    from geoformer_tpu.core.cache import enable_compile_cache
    from geoformer_tpu.core.platform import respect_platform_env

    respect_platform_env()
    enable_compile_cache()
    from geoformer_tpu.config import (
        GeoFormerConfig,
        GeoModuleConfig,
        MatchConfig,
        TrainConfig,
    )
    from geoformer_tpu.data.synthetic import make_pair_batch
    from geoformer_tpu.models import GeoFormer
    from geoformer_tpu.train.trainer import init_state, make_train_step

    B, H, W = args.batch, args.height, args.width
    cfg = GeoFormerConfig(
        match=MatchConfig(max_matches=512, force_one_match=True),
        geo=GeoModuleConfig(ransac_iters=256, max_inliers=512,
                            use_pallas=not args.f32),
        use_bf16=not args.f32,
    )
    tcfg = TrainConfig(batch_size=B, image_hw=(H, W))
    model = GeoFormer(cfg)
    state, opt = init_state(model, tcfg, jax.random.key(0))
    step = jax.jit(make_train_step(model, opt, tcfg), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    bank = jnp.asarray(rng.random((args.iters + 1, B, H, W), np.float32))
    lr = jnp.asarray(1e-4, jnp.float32)

    t0 = time.perf_counter()
    batch = make_pair_batch(bank[0], jax.random.key(1))
    state, m = step(state, batch, jax.random.key(2), lr)
    print(f"# compile+first: {time.perf_counter() - t0:.1f}s "
          f"loss={float(m['loss']):.3f}", flush=True)

    times = []
    for i in range(args.iters):
        batch = make_pair_batch(bank[i + 1], jax.random.key(3 + i))
        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.key(100 + i), lr)
        float(m["loss"])  # force host fetch: tunnel block_until_ready lies
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(f"# per-step ms: {[round(t * 1e3, 1) for t in times]}", flush=True)
    print(json.dumps({
        "metric": "train_imgs_per_s_per_chip_480px",
        "value": round(B / dt, 2),
        "unit": "imgs/s",
        "step_ms": round(dt * 1e3, 1),
        "loss": round(float(m["loss"]), 3),
    }))


if __name__ == "__main__":
    main()
