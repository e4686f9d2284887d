"""Ablation round 2: decompose the non-GAM mass of the B=8 forward.

Isolated raw-stage rigs over the tunnel are untrustworthy (twice observed
timing single stages SLOWER than the whole forward — plugin dispatch
artifacts), so this measures ONLY full-model config ablations under bench
methodology (distinct inputs, host fetch per call, median of 8 — see
profile_ablation.bench_model).

    python scripts/profile_ablation2.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_ablation import bench_model  # noqa: E402


def main():
    from geoformer_tpu.core.cache import enable_compile_cache
    from geoformer_tpu.core.platform import respect_platform_env

    respect_platform_env()
    enable_compile_cache()

    import dataclasses

    from geoformer_tpu.config import (
        CoarseTransformerConfig,
        FineTransformerConfig,
        GeoFormerConfig,
        GeoModuleConfig,
        MatchConfig,
    )
    from geoformer_tpu.models import GeoFormer

    B, H, W = 8, 480, 640

    base = GeoFormerConfig(
        match=MatchConfig(max_matches=1024),
        geo=GeoModuleConfig(ransac_iters=256, max_inliers=1024,
                            use_pallas=True),
        use_bf16=True)

    print(f"== ablation-2  B={B} {H}x{W} bf16 ==", flush=True)

    configs = {
        "A_default": base,
        "I_no_coarse_tf": dataclasses.replace(
            base, coarse=CoarseTransformerConfig(layer_names=())),
        "J_match512": dataclasses.replace(
            base, match=MatchConfig(max_matches=512)),
        "L_coarse4layers": dataclasses.replace(
            base, coarse=CoarseTransformerConfig(
                layer_names=("self", "cross") * 2)),
        # backbone + extraction + fine-decode plumbing only: every
        # transformer stack off. A - M = all attention stages together;
        # M - tunnel-floor ~= backbone + streamed matching.
        "M_bb_extract": dataclasses.replace(
            base,
            coarse=CoarseTransformerConfig(layer_names=()),
            geo=dataclasses.replace(base.geo, layer_names=()),
            fine=FineTransformerConfig(layer_names=())),
    }
    meds = {}
    for name, cfg in configs.items():
        meds[name] = bench_model(GeoFormer(cfg), B, H, W, label=name)
    if "A_default" in meds:
        a = meds["A_default"]
        for name, m in meds.items():
            if name != "A_default":
                print(f"  {name}: delta vs default = {a - m:+.1f} ms",
                      flush=True)


if __name__ == "__main__":
    main()
