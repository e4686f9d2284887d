"""Per-stage timing of the GeoFormer forward on the attached accelerator.

Times each pipeline stage in isolation with realistic shapes (B=4, 480x640)
so optimization effort goes where the milliseconds are. Usage:

    python scripts/profile_model.py [--small]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    # force host fetch (experimental PJRT plugins can return early)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:<34} {dt:8.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    from geoformer_tpu.core.cache import enable_compile_cache
    from geoformer_tpu.core.platform import respect_platform_env

    respect_platform_env()
    enable_compile_cache()
    from geoformer_tpu.config import (
        GeoFormerConfig,
        GeoModuleConfig,
        MatchConfig,
    )
    from geoformer_tpu.models import GeoFormer
    from geoformer_tpu.models.backbone import ResNetFPN
    from geoformer_tpu.models.coarse_matching import coarse_match
    from geoformer_tpu.models.geo_module import GeoModule, _build_geo_state
    from geoformer_tpu.models.position import add_position_encoding
    from geoformer_tpu.models.transformer import LocalFeatureTransformer
    from geoformer_tpu.geometry.ransac import ransac_homography

    B = args.batch
    H, W = (128, 160) if args.small else (480, 640)
    hc, wc = H // 8, W // 8
    L = hc * wc
    cfg = GeoFormerConfig(
        match=MatchConfig(max_matches=1024),
        geo=GeoModuleConfig(ransac_iters=256, max_inliers=1024),
    )
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    print(f"== stage timings  B={B}  {H}x{W}  L={L} ==")

    # full model
    model = GeoFormer(cfg)
    img = jnp.asarray(rng.random((B, H, W, 1), np.float32))
    variables = model.init({"params": key, "ransac": key}, img[:1], img[:1])
    full = jax.jit(lambda v, a, b: model.apply(
        v, a, b, rngs={"ransac": jax.random.key(0)}))
    t_full = timeit(full, variables, img, img, label="full forward")

    # bench-default config: bf16 + Pallas GAM kernels (box-window cross)
    cfg_fast = cfg.replace(use_bf16=True,
                           geo=cfg.geo.__class__(
                               ransac_iters=256, max_inliers=1024,
                               use_pallas=True))
    model_fast = GeoFormer(cfg_fast)
    full_fast = jax.jit(lambda v, a, b: model_fast.apply(
        v, a, b, rngs={"ransac": jax.random.key(0)}))
    timeit(full_fast, variables, img, img,
           label="full forward (bf16+pallas)")

    # backbone (2B images, as in the shared-backbone trick)
    bb = ResNetFPN()
    bvars = bb.init(key, img[:1])
    bfn = jax.jit(lambda v, x: bb.apply(v, x))
    timeit(bfn, bvars, jnp.concatenate([img, img], 0), label="backbone (2B)")

    bb16 = ResNetFPN(dtype=jnp.bfloat16)
    bfn16 = jax.jit(lambda v, x: bb16.apply(v, x))
    timeit(bfn16, bvars, jnp.concatenate([img, img], 0),
           label="backbone (2B, bf16)")

    # extraction without materializing conf (the eval path)
    from geoformer_tpu.models.coarse_matching import extract_matches
    from geoformer_tpu.ops.matching import dual_softmax

    def match_extract_only(a, b):
        conf = dual_softmax(a, b, 0.1)
        m = extract_matches(conf, 0.2, 1024)
        return m.i_ids, m.j_ids, m.valid, m.mconf

    cfn2 = jax.jit(match_extract_only)

    # coarse transformer
    tf = LocalFeatureTransformer(256, 8, ("self", "cross") * 4, "linear")
    f0 = jnp.asarray(rng.random((B, L, 256), np.float32))
    tvars = tf.init(key, f0[:1], f0[:1])
    tfn = jax.jit(lambda v, a, b: tf.apply(v, a, b))
    timeit(tfn, tvars, f0, f0, label="coarse transformer (8 layers)")

    # coarse matching (dual softmax + extract) x2 passes
    cfn = jax.jit(lambda a, b: coarse_match(a, b, 0.2, 0.1, 1024))
    timeit(cfn, f0, f0, label="coarse match (returns conf)")
    timeit(cfn2, f0, f0, label="coarse match (extract only)")

    # RANSAC alone
    pts = jnp.asarray(rng.random((B, 1024, 2), np.float32) * 500)
    valid = jnp.ones((B, 1024), bool)
    rfn = jax.jit(jax.vmap(lambda k, a, b, v: ransac_homography(
        k, a, b, v, thr=8.0, iters=256, refine_iters=2)))
    keys = jax.random.split(key, B)
    timeit(rfn, keys, pts, pts, valid, label="RANSAC (256 hyps, vmap B)")

    # GAM end to end
    geo = GeoModule(cfg.geo, 256)
    cnn = jnp.asarray(rng.random((B, hc, wc, 256), np.float32))
    m = cfn(f0, f0)
    gvars = geo.init({"params": key, "ransac": key}, cnn[:1], cnn[:1],
                     jax.tree.map(lambda x: x[:1], m), 8, key)
    gfn = jax.jit(lambda v, a, b, mm: geo.apply(
        v, a, b, mm, 8, jax.random.key(0)))
    timeit(gfn, gvars, cnn, cnn, m, label="GAM (ransac + 4 geo layers)")

    print(f"{'(stages are timed in isolation)':<34}")


if __name__ == "__main__":
    main()
