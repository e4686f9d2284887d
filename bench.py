"""Benchmark: matched image pairs per second per chip on the full GeoFormer
forward (480x640, batch 4), on whatever accelerator jax exposes.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference publishes no speed numbers (SURVEY.md §6); the
eval-harness wall-clock `match_time` for the reference on a CUDA GPU is ~0.2 s
per 480px pair (5 pairs/s) per community reports, so we report the ratio to a
5 pairs/s/device reference point.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from geoformer_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    from geoformer_tpu.config import (
        GeoFormerConfig,
        GeoModuleConfig,
        MatchConfig,
    )
    from geoformer_tpu.models import GeoFormer

    B, H, W = 4, 480, 640
    cfg = GeoFormerConfig(
        match=MatchConfig(max_matches=1024),
        geo=GeoModuleConfig(ransac_iters=256, max_inliers=1024),
    )
    model = GeoFormer(cfg)
    key = jax.random.key(0)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.random((B, H, W, 1), np.float32))
    img1 = jnp.asarray(rng.random((B, H, W, 1), np.float32))
    params = model.init({"params": key, "ransac": key},
                        img0[:1], img1[:1])

    @jax.jit
    def fwd(params, i0, i1):
        return model.apply(params, i0, i1, rngs={"ransac": jax.random.key(0)})

    # warmup / compile. A host fetch (not just block_until_ready) closes the
    # loop — experimental PJRT plugins have been observed to return from
    # block_until_ready before execution completes.
    t0 = time.perf_counter()
    out = fwd(params, img0, img1)
    float(out.fine.mconf.sum())
    compile_s = time.perf_counter() - t0

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, img0, img1)
    float(out.fine.mconf.sum())
    dt = time.perf_counter() - t0

    pairs_per_s = B * iters / dt
    import sys

    print(f"# compile+first: {compile_s:.1f}s  steady: "
          f"{1e3 * dt / (B * iters):.2f} ms/pair", file=sys.stderr, flush=True)
    baseline = 5.0  # reference ~5 pairs/s/GPU at 480px (no published number)
    print(json.dumps({
        "metric": "matched_pairs_per_s_per_chip_480px",
        "value": round(pairs_per_s, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
