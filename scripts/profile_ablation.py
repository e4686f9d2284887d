"""Full-forward stage attribution by ABLATION (bench-timing methodology).

Isolated-stage rigs over the tunnel are unreliable (plugin short-cuts /
per-call overheads — the round-4 GAM decomposition produced isolated layers
slower than the whole forward). This rig instead times the FULL forward
under config ablations with bench.py's trustworthy protocol: distinct
inputs per call + a host scalar fetch per call, median of K. Stage cost =
difference of medians.

    python scripts/profile_ablation.py [--batch 8] [--skip ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_model(model, B, H, W, iters=8, label=""):
    key = jax.random.key(0)
    rng = np.random.default_rng(0)
    bank = jnp.asarray(rng.random((iters + 1, B, H, W, 1), np.float32))
    params = model.init({"params": key, "ransac": key},
                        bank[0][:1], bank[0][:1])

    @jax.jit
    def fwd(params, i0, i1):
        return model.apply(params, i0, i1, rngs={"ransac": jax.random.key(0)})

    t0 = time.perf_counter()
    out = fwd(params, bank[0], bank[1])
    float(out.fine.mconf.sum())
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fwd(params, bank[i], bank[i + 1])
        float(out.fine.mconf.sum())
        times.append(time.perf_counter() - t0)
    med = float(np.median(times)) * 1e3
    print(f"{label:<46} {med:8.1f} ms   (compile {compile_s:5.1f}s, "
          f"p10-p90 {np.percentile(times, 10)*1e3:.0f}-"
          f"{np.percentile(times, 90)*1e3:.0f})", flush=True)
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--only", default=None,
                    help="comma-separated config keys to run")
    args = ap.parse_args()

    from geoformer_tpu.core.cache import enable_compile_cache
    from geoformer_tpu.core.platform import respect_platform_env

    respect_platform_env()
    enable_compile_cache()

    import dataclasses

    from geoformer_tpu.config import (
        FineTransformerConfig,
        GeoFormerConfig,
        GeoModuleConfig,
        MatchConfig,
    )
    from geoformer_tpu.models import GeoFormer

    B, H, W = args.batch, 480, 640
    def geo(**kw):
        kw = {"ransac_iters": 256, "max_inliers": 1024, "use_pallas": True,
              **kw}
        return GeoModuleConfig(**kw)
    base = GeoFormerConfig(match=MatchConfig(max_matches=1024),
                           geo=geo(), use_bf16=True)

    configs = {
        "A_bench_default": base,
        "B_no_geo_layers": dataclasses.replace(base, geo=geo(layer_names=())),
        "C_self_only": dataclasses.replace(
            base, geo=geo(layer_names=("self", "self"))),
        "D_cross_only": dataclasses.replace(
            base, geo=geo(layer_names=("cross", "cross"))),
        "E_ransac32": dataclasses.replace(base, geo=geo(ransac_iters=32)),
        "F_xla_self": dataclasses.replace(
            base, geo=geo(use_pallas_self=False)),
        "G_no_fine_tf": dataclasses.replace(
            base, fine=FineTransformerConfig(layer_names=())),
        "H_gather_cross": dataclasses.replace(
            base, geo=geo(use_pallas=False, use_pallas_self=False)),
    }
    if args.only:
        keys = args.only.split(",")
        configs = {k: v for k, v in configs.items()
                   if any(k.startswith(s) for s in keys)}

    print(f"== ablation timings  B={B} {H}x{W} bf16 ==", flush=True)
    for name, cfg in configs.items():
        bench_model(GeoFormer(cfg), B, H, W, label=name)


if __name__ == "__main__":
    main()
