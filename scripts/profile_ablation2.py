"""Ablation round 2: decompose the non-GAM ~118 ms of the B=8 forward.

Same bench-grade methodology as profile_ablation.py (distinct inputs,
host fetch per call, median). Adds raw backbone / coarse-transformer
timings and a batch sweep to expose the fixed tunnel/dispatch overhead.

    python scripts/profile_ablation2.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from profile_ablation import bench_model  # noqa: E402


def bench_fn(fn, inputs_bank, label, iters=8):
    out = fn(*inputs_bank[0])
    jax.block_until_ready(out)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(*inputs_bank[i % len(inputs_bank)])
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        times.append(time.perf_counter() - t0)
    med = float(np.median(times)) * 1e3
    print(f"{label:<46} {med:8.1f} ms   (p10-p90 "
          f"{np.percentile(times, 10)*1e3:.0f}-"
          f"{np.percentile(times, 90)*1e3:.0f})", flush=True)
    return med


def main():
    from geoformer_tpu.core.cache import enable_compile_cache
    from geoformer_tpu.core.platform import respect_platform_env

    respect_platform_env()
    enable_compile_cache()

    import dataclasses

    from geoformer_tpu.config import (
        CoarseTransformerConfig,
        GeoFormerConfig,
        GeoModuleConfig,
        MatchConfig,
    )
    from geoformer_tpu.models import GeoFormer
    from geoformer_tpu.models.backbone import ResNetFPN
    from geoformer_tpu.models.transformer import LocalFeatureTransformer

    B, H, W = 8, 480, 640
    L = (H // 8) * (W // 8)
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    base = GeoFormerConfig(
        match=MatchConfig(max_matches=1024),
        geo=GeoModuleConfig(ransac_iters=256, max_inliers=1024,
                            use_pallas=True),
        use_bf16=True)

    print(f"== ablation-2  B={B} {H}x{W} bf16 ==", flush=True)

    # raw backbone fwd on 2B images (the model's actual call)
    bb = ResNetFPN(dtype=jnp.bfloat16)
    img_bank = [jnp.asarray(rng.random((2 * B, H, W, 1), np.float32))
                for _ in range(4)]
    bvars = bb.init(key, img_bank[0][:1])
    bfn = jax.jit(lambda v, x: bb.apply(v, x))
    bench_fn(lambda x: bfn(bvars, x), [(x,) for x in img_bank],
             "raw backbone fwd (2B=16 imgs)")

    # raw coarse transformer fwd (8 linear layers, L=4800)
    tf = LocalFeatureTransformer(256, 8, ("self", "cross") * 4, "linear",
                                 dtype=jnp.bfloat16)
    f_bank = [jnp.asarray(rng.random((B, L, 256), np.float32), jnp.bfloat16)
              for _ in range(4)]
    tvars = tf.init(key, f_bank[0][:1], f_bank[0][:1])
    tfn = jax.jit(lambda v, a, b: tf.apply(v, a, b))
    bench_fn(lambda a, b: tfn(tvars, a, b),
             [(f_bank[i], f_bank[(i + 1) % 4]) for i in range(4)],
             "raw coarse transformer fwd (8 layers)")

    # streaming coarse match extraction (one pass)
    from geoformer_tpu.models.coarse_matching import coarse_match

    cfn = jax.jit(lambda a, b: coarse_match(a, b, 0.2, 0.1, 1024,
                                            streaming=True))
    bench_fn(lambda a, b: cfn(a, b),
             [(f_bank[i].astype(jnp.float32),
               f_bank[(i + 1) % 4].astype(jnp.float32)) for i in range(4)],
             "streaming coarse match (1 pass)")

    # full-model config ablations
    configs = {
        "I_no_coarse_tf": dataclasses.replace(
            base, coarse=CoarseTransformerConfig(layer_names=())),
        "J_match512": dataclasses.replace(
            base, match=MatchConfig(max_matches=512)),
    }
    for name, cfg in configs.items():
        bench_model(GeoFormer(cfg), B, H, W, label=name)

    # batch sweep at the default config (fixed-overhead amortization)
    for b in (4, 12, 16):
        med = bench_model(GeoFormer(base), b, H, W,
                          label=f"K_batch{b}")
        print(f"  -> {b / (med / 1e3):.1f} pairs/s", flush=True)


if __name__ == "__main__":
    main()
