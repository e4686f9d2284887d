"""A/B the fine-stage layout at model shapes on TPU (fwd AND fwd+bwd).

Round-2 profiles put the fine transformer at ~3% MFU and found XLA padding
the [B*M, 25, *] temps (25 -> 32 sublanes; 25 -> 128 lanes on the 25x25
dual-softmax) ~5x in the train backward (TODO round-2 #3). Candidate
layouts, all math-identical on the 25 real tokens:

  A. current       — [B*M, 25, C] tokens, linear attention per head.
  B. padded WW=32  — explicit zero-pad to 32 tokens + kv/q masks
                     (linear attention with masks is exact: padded keys
                     contribute 0 to KV and Ksum; /v_length rescales out).
  C. full-attn     — full (softmax) attention instead of linear for the
                     25-token windows: [B*M*H, 25, 25] score matrices are
                     tiny; fewer relayouts than the per-head linear einsums.
  D. flat-linear   — linear_attention_flat on [B*M, 25, C] lanes.

Each variant times (i) the 1x self/cross transformer forward and (ii) a
train-shaped fwd+bwd through transformer + dual-softmax + BCE-style loss.

    python scripts/profile_fine_stage.py [--batch 4] [--m 512] [--f32]
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
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:<52} {dt:8.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--m", type=int, default=512)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    from geoformer_tpu.core.cache import enable_compile_cache
    from geoformer_tpu.core.platform import respect_platform_env

    respect_platform_env()
    enable_compile_cache()

    from geoformer_tpu.config import FineTransformerConfig
    from geoformer_tpu.models.transformer import LocalFeatureTransformer
    from geoformer_tpu.ops.matching import dual_softmax

    fcfg = FineTransformerConfig()
    C = fcfg.d_model
    H = fcfg.nhead
    dt = jnp.float32 if args.f32 else jnp.bfloat16
    BM = args.batch * args.m
    WW = 25
    WP = 32

    rng = np.random.default_rng(0)
    w0 = jnp.asarray(rng.normal(size=(BM, WW, C)).astype(np.float32), dt)
    w1 = jnp.asarray(rng.normal(size=(BM, WW, C)).astype(np.float32), dt)
    label = jnp.asarray(rng.random((BM, WW, WW)) < 0.04, jnp.float32)

    def make_tf(attention):
        tf = LocalFeatureTransformer(C, H, fcfg.layer_names, attention,
                                     dtype=dt)
        vs = tf.init(jax.random.key(0), w0[:2], w1[:2])
        return tf, vs

    tf_lin, vs_lin = make_tf("linear")
    tf_full, vs_full = make_tf("full")

    pad = ((0, 0), (0, WP - WW), (0, 0))
    mask = jnp.concatenate([jnp.ones((BM, WW), bool),
                            jnp.zeros((BM, WP - WW), bool)], axis=1)

    # ---- forwards ----
    variants = {}

    def fwd_current(v, a, b):
        return tf_lin.apply(v, a, b)

    def fwd_padded(v, a, b):
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
        t0, t1 = tf_lin.apply(v, a, b, mask, mask)
        return t0[:, :WW], t1[:, :WW]

    def fwd_full(v, a, b):
        return tf_full.apply(v, a, b)

    variants["A current (linear, 25 tok)"] = (fwd_current, vs_lin)
    variants["B padded WW=32 (linear+mask)"] = (fwd_padded, vs_lin)
    variants["C full attention (25 tok)"] = (fwd_full, vs_full)

    print(f"== fine stage A/B  B*M={BM} WW={WW} C={C} "
          f"{'f32' if args.f32 else 'bf16'} ==", flush=True)
    outs = {}
    for name, (fn, vs) in variants.items():
        jf = jax.jit(fn)
        outs[name] = jf(vs, w0, w1)
        timeit(jf, vs, w0, w1, label=f"fwd  {name}")

    # numerics: A vs B must be exact-ish (same params, masked pad)
    a0 = np.asarray(outs["A current (linear, 25 tok)"][0], np.float32)
    b0 = np.asarray(outs["B padded WW=32 (linear+mask)"][0], np.float32)
    print(f"A-vs-B max abs diff: {np.abs(a0 - b0).max():.2e}", flush=True)

    # ---- train-shaped fwd+bwd: transformer + dual-softmax + BCE ----
    def loss_from(t0, t1):
        conf = dual_softmax(t0, t1, 0.1)
        conf = jnp.clip(conf.astype(jnp.float32), 1e-6, 1 - 1e-6)
        bce = -(label * jnp.log(conf) + (1 - label) * jnp.log1p(-conf))
        return bce.mean()

    def loss_flat_from(t0, t1):
        # identical math; flattens the [., 25, 25] conf to [., 625] lanes
        # immediately so the saved backward temps are lane-tight
        c = t0.shape[-1]
        norm = 1.0 / jnp.sqrt(jnp.asarray(c, t0.dtype))
        sim = jnp.einsum("blc,bsc->bls", t0 * norm, t1 * norm) / 0.1
        conf = (jax.nn.softmax(sim, axis=1)
                * jax.nn.softmax(sim, axis=2)).reshape(BM, WW * WW)
        conf = jnp.clip(conf.astype(jnp.float32), 1e-6, 1 - 1e-6)
        lab = label.reshape(BM, WW * WW)
        bce = -(lab * jnp.log(conf) + (1 - lab) * jnp.log1p(-conf))
        return bce.mean()

    train_variants = {
        "A current": (lambda v, a, b: loss_from(*tf_lin.apply(v, a, b)),
                      vs_lin),
        "A + flat-conf loss": (
            lambda v, a, b: loss_flat_from(*tf_lin.apply(v, a, b)), vs_lin),
        "B padded WW=32": (
            lambda v, a, b: loss_from(
                *(t[:, :WW] for t in tf_lin.apply(
                    v, jnp.pad(a, pad), jnp.pad(b, pad), mask, mask))),
            vs_lin),
        "C full attention": (
            lambda v, a, b: loss_from(*tf_full.apply(v, a, b)), vs_full),
        "C + flat-conf loss": (
            lambda v, a, b: loss_flat_from(*tf_full.apply(v, a, b)),
            vs_full),
    }
    for name, (fn, vs) in train_variants.items():
        g = jax.jit(jax.grad(fn, argnums=(1, 2)))
        timeit(g, vs, w0, w1, label=f"fwd+bwd  {name}")


if __name__ == "__main__":
    main()
