"""Per-stage fwd+bwd timing of the GeoFormer TRAIN step.

Decomposes the training step so backward-pass optimization effort goes where
the milliseconds are (the forward-only breakdown lives in profile_model.py).
Each stage is timed in isolation under jax.grad with a sum-of-squares
pseudo-loss; the full train step rows use the real streaming loss.

    python scripts/profile_train.py [--small] [--batch 4]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=6, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:<40} {dt:8.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--gam-only", action="store_true",
                    help="only the GAM fwd+bwd rows (kernel isolation)")
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
    from geoformer_tpu.models.backbone import ResNetFPN
    from geoformer_tpu.models.geo_module import GeoModule
    from geoformer_tpu.models.coarse_matching import coarse_match
    from geoformer_tpu.models.transformer import LocalFeatureTransformer
    from geoformer_tpu.train.optim import make_optimizer
    from geoformer_tpu.train.trainer import init_state, make_train_step

    B = args.batch
    H, W = (128, 160) if args.small else (480, 640)
    hc, wc = H // 8, W // 8
    L = hc * wc
    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    print(f"== train-step stage timings  B={B}  {H}x{W}  L={L} ==")

    def full_step_row(use_bf16, use_pallas, label):
        cfg = GeoFormerConfig(
            match=MatchConfig(max_matches=512, force_one_match=True),
            geo=GeoModuleConfig(ransac_iters=256, max_inliers=512,
                                use_pallas=use_pallas),
            use_bf16=use_bf16,
        )
        model = GeoFormer(cfg)
        tcfg = TrainConfig(batch_size=B, image_hw=(H, W))
        state, opt = init_state(model, tcfg, key)
        step = jax.jit(make_train_step(model, opt, tcfg))
        base = jnp.asarray(rng.random((B, H, W), np.float32))
        batch = make_pair_batch(base, jax.random.key(1))
        lr = jnp.asarray(3e-4, jnp.float32)
        timeit(lambda s, b: step(s, b, jax.random.key(2), lr)[1]["loss"],
               state, batch, label=label)

    if not args.gam_only:
        full_step_row(False, False, "train step (f32)")
        full_step_row(False, True, "train step (f32+pallas)")
        full_step_row(True, True, "train step (bf16+pallas)")

    img2b = jnp.asarray(rng.random((2 * B, H, W, 1), np.float32))

    def stage_grad_row(module, init_args, apply_fn, label):
        variables = module.init(*init_args)

        def pseudo_loss(v, *xs):
            out = apply_fn(v, *xs)
            return sum((jnp.asarray(o, jnp.float32) ** 2).sum()
                       for o in jax.tree.leaves(out))

        g = jax.jit(jax.grad(pseudo_loss))
        return variables, g

    f0 = jnp.asarray(rng.random((B, L, 256), np.float32))
    if not args.gam_only:
        # backbone fwd+bwd on the shared-backbone 2B stack
        for dt_, lbl in ((jnp.float32, "backbone fwd+bwd (2B, f32)"),
                         (jnp.bfloat16, "backbone fwd+bwd (2B, bf16)")):
            bb = ResNetFPN(dtype=dt_)
            v, g = stage_grad_row(bb, (key, img2b[:1]),
                                  lambda v, x: bb.apply(v, x), lbl)
            timeit(g, v, img2b, label=lbl)

        # coarse transformer fwd+bwd
        for dt_, lbl in ((jnp.float32, "coarse transformer fwd+bwd (f32)"),
                         (jnp.bfloat16, "coarse transformer fwd+bwd (bf16)")):
            tf = LocalFeatureTransformer(256, 8, ("self", "cross") * 4,
                                         "linear", dtype=dt_)
            v, g = stage_grad_row(tf, (key, f0[:1], f0[:1]),
                                  lambda v, a, b: tf.apply(v, a, b), lbl)
            timeit(g, v, f0, f0, label=lbl)

    # GAM fwd+bwd (RANSAC inside is stop-gradient; grads flow through attn)
    cnn = jnp.asarray(rng.random((B, hc, wc, 256), np.float32))
    m = jax.jit(lambda a, b: coarse_match(a, b, 0.2, 0.1, 512,
                                          force_one=True))(f0, f0)
    if args.gam_only:
        gam_rows = [
            (True, True, jnp.bfloat16, "GAM fwd+bwd (bf16 box+mka)"),
            (True, False, jnp.bfloat16, "GAM fwd+bwd (bf16 box-only)"),
            (False, False, jnp.bfloat16, "GAM fwd+bwd (bf16 no-pallas)"),
        ]
    else:
        gam_rows = [
            (False, True, jnp.float32, "GAM fwd+bwd (f32)"),
            (True, True, jnp.bfloat16, "GAM fwd+bwd (bf16+pallas)"),
        ]
    # RANSAC isolation: the geometric fit alone (stop-gradient, so fwd-only
    # in the train step). If this dominates the GAM stage, the lever is the
    # hypothesis loop shape, not the attention kernels.
    from geoformer_tpu.models.geo_module import _build_geo_state

    gcfg = GeoModuleConfig(ransac_iters=256, max_inliers=512)
    rfit = jax.jit(lambda mm, k: _build_geo_state(
        mm, k, (hc, wc), (hc, wc), 8, gcfg).H)
    timeit(rfit, m, jax.random.key(0),
           label="RANSAC fit alone (256 iters, fwd)")

    for use_pallas, use_self, dt_, lbl in gam_rows:
        geo = GeoModule(GeoModuleConfig(ransac_iters=256, max_inliers=512,
                                        use_pallas=use_pallas,
                                        use_pallas_self=use_self), 256,
                        dtype=dt_)
        variables = geo.init({"params": key, "ransac": key}, cnn[:1],
                             cnn[:1], jax.tree.map(lambda x: x[:1], m), 8,
                             key)

        def pseudo_loss(v, a, b, mm):
            g0, g1, _ = geo.apply(v, a, b, mm, 8, jax.random.key(0))
            return (jnp.asarray(g0, jnp.float32) ** 2).sum() + \
                (jnp.asarray(g1, jnp.float32) ** 2).sum()

        g = jax.jit(jax.grad(pseudo_loss))
        timeit(g, variables, cnn, cnn, m, label=lbl)

    if not args.gam_only:
        # fine stage fwd+bwd: transformer over [B*M, WW, C] windows
        M, WW, Cf = 512, 25, 128
        wtok = jnp.asarray(rng.random((B * M, WW, Cf), np.float32))
        for dt_, lbl in ((jnp.float32, "fine transformer fwd+bwd (f32)"),
                         (jnp.bfloat16, "fine transformer fwd+bwd (bf16)")):
            ftf = LocalFeatureTransformer(Cf, 8, ("self", "cross"), "linear",
                                          dtype=dt_)
            v, g = stage_grad_row(ftf, (key, wtok[:1], wtok[:1]),
                                  lambda v, a, b: ftf.apply(v, a, b), lbl)
            timeit(g, v, wtok, wtok, label=lbl)

        # layout experiment: same token count padded to a 32-long window
        # (8-aligned sublane) with a validity mask — measures what the
        # 25-token layout costs (TODO #3)
        wtok32 = jnp.asarray(rng.random((B * M, 32, Cf), np.float32))
        wmask = jnp.asarray(
            (np.arange(32) < WW)[None].repeat(B * M, 0).astype(np.float32))
        ftf = LocalFeatureTransformer(Cf, 8, ("self", "cross"), "linear",
                                      dtype=jnp.bfloat16)
        variables = ftf.init(key, wtok32[:1], wtok32[:1], wmask[:1],
                             wmask[:1])

        def pad_loss(v, a, b_, m_):
            o = ftf.apply(v, a, b_, m_, m_)
            return sum((jnp.asarray(x, jnp.float32) ** 2).sum()
                       for x in jax.tree.leaves(o))

        g32 = jax.jit(jax.grad(pad_loss))
        timeit(g32, variables, wtok32, wtok32, wmask,
               label="fine transformer fwd+bwd (bf16, WW=32 masked)")

    print("(stages timed in isolation; full step rows use the real loss)")


if __name__ == "__main__":
    main()
