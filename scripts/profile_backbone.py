"""Backbone sub-stage profile: where do the ResNet-FPN milliseconds go?

The round-2 train profile showed the backbone is the dominant train-step
block (80.8 ms bf16 of 178 ms at B=4, fwd+bwd over 2B=8 images) and that
f32->bf16 barely moves it. This script times stem / layer1 / layer2 /
layer3 / FPN in isolation (fwd and fwd+bwd) and pairs each with its
analytic FLOP count so optimization effort goes to the stage with the
worst MFU, not just the biggest one.

    python scripts/profile_backbone.py [--batch 8] [--iters 8]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 197e12  # v5e MXU peak


def _sync(out):
    # force a host fetch of ONE element (block_until_ready can return before
    # execution completes on the axon tunnel; fetching the whole tensor
    # would time the ~MB/s tunnel transfer instead of the device)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def conv_flops(h, w, cin, cout, k):
    return h * w * cin * cout * k * k * 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8,
                    help="images (2B of the B=4 train step)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    from geoformer_tpu.core.cache import enable_compile_cache
    from geoformer_tpu.core.platform import respect_platform_env

    respect_platform_env()
    enable_compile_cache()
    from flax import linen as nn

    from geoformer_tpu.models.backbone import BasicBlock, ResNetFPN
    from geoformer_tpu.ops.resize import resize_bilinear_align_corners

    dt = jnp.float32 if args.f32 else jnp.bfloat16
    B = args.batch
    H, W = 480, 640
    key = jax.random.key(0)
    rng = np.random.default_rng(0)
    print(f"== backbone sub-stages  B={B} {H}x{W} "
          f"{'f32' if args.f32 else 'bf16'} ==", flush=True)

    d1, d2, d3 = 128, 196, 256

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(128, (7, 7), strides=(2, 2),
                        padding=[(3, 3)] * 2, use_bias=False, dtype=dt,
                        name="conv1")(x)
            h = nn.BatchNorm(use_running_average=True, dtype=dt,
                             name="bn1")(h)
            return nn.relu(h)

    class Stage(nn.Module):
        planes: int
        stride: int

        @nn.compact
        def __call__(self, x):
            x = BasicBlock(self.planes, self.stride, dt, name="b0")(x)
            return BasicBlock(self.planes, 1, dt, name="b1")(x)

    class FPN(nn.Module):
        @nn.compact
        def __call__(self, x1, x2, x3):
            bn = lambda name: nn.BatchNorm(  # noqa: E731
                use_running_average=True, dtype=dt, name=name)
            c1 = lambda f, n: nn.Conv(f, (1, 1), use_bias=False, dtype=dt,  # noqa: E731,E501
                                      name=n)
            c3 = lambda f, n: nn.Conv(f, (3, 3), padding=[(1, 1)] * 2,  # noqa: E731,E501
                                      use_bias=False, dtype=dt, name=n)
            x3_out = c1(d3, "l3_out")(x3)
            x2_out = c1(d3, "l2_out")(x2)
            m2 = x2_out + resize_bilinear_align_corners(
                x3_out, x2_out.shape[1:3])
            m2 = nn.leaky_relu(bn("l2_bn")(c3(d3, "l2_m1")(m2)), 0.01)
            x2_out = c3(d2, "l2_m2")(m2)
            x1_out = c1(d2, "l1_out")(x1)
            m1 = x1_out + resize_bilinear_align_corners(
                x2_out, x1_out.shape[1:3])
            m1 = nn.leaky_relu(bn("l1_bn")(c3(d2, "l1_m1")(m1)), 0.01)
            return x3_out, c3(d1, "l1_m2")(m1)

    h2, w2 = H // 2, W // 2
    h4, w4 = H // 4, W // 4
    h8, w8 = H // 8, W // 8

    gflops = {
        "stem": conv_flops(h2, w2, 1, 128, 7),
        "layer1": 4 * conv_flops(h2, w2, 128, 128, 3),
        "layer2": (conv_flops(h4, w4, 128, 196, 3)
                   + 3 * conv_flops(h4, w4, 196, 196, 3)
                   + conv_flops(h4, w4, 128, 196, 1)),
        "layer3": (conv_flops(h8, w8, 196, 256, 3)
                   + 3 * conv_flops(h8, w8, 256, 256, 3)
                   + conv_flops(h8, w8, 196, 256, 1)),
        "fpn": (conv_flops(h8, w8, 256, 256, 1)
                + conv_flops(h4, w4, 196, 256, 1)
                + conv_flops(h4, w4, 256, 256, 3)
                + conv_flops(h4, w4, 256, 196, 3)
                + conv_flops(h2, w2, 128, 196, 1)
                + conv_flops(h2, w2, 196, 196, 3)
                + conv_flops(h2, w2, 196, 128, 3)),
    }

    stages = [
        ("stem", Stem(), (B, H, W, 1)),
        ("layer1", Stage(d1, 1), (B, h2, w2, 128)),
        ("layer2", Stage(d2, 2), (B, h2, w2, 128)),
        ("layer3", Stage(d3, 2), (B, h4, w4, 196)),
    ]

    total_fwd = total_bwd = 0.0
    for name, mod, shape in stages:
        x = jnp.asarray(rng.random(shape, np.float32), dt)
        v = mod.init(key, x)
        fwd = jax.jit(lambda v_, x_, m=mod: m.apply(v_, x_))
        g = jax.jit(jax.grad(
            lambda v_, x_, m=mod:
            (m.apply(v_, x_).astype(jnp.float32) ** 2).sum()))
        tf = timeit(fwd, v, x, iters=args.iters)
        tb = timeit(g, v, x, iters=args.iters)
        fl = gflops[name] * B
        print(f"{name:<8} fwd {tf:7.2f} ms ({fl / tf / 1e9:6.1f} TF/s, "
              f"MFU {fl / (tf / 1e3) / PEAK_BF16 * 100:4.1f}%)   "
              f"fwd+bwd {tb:7.2f} ms (MFU "
              f"{3 * fl / (tb / 1e3) / PEAK_BF16 * 100:4.1f}%)",
              flush=True)
        total_fwd += tf
        total_bwd += tb

    # FPN takes three inputs
    x1 = jnp.asarray(rng.random((B, h2, w2, 128), np.float32), dt)
    x2 = jnp.asarray(rng.random((B, h4, w4, 196), np.float32), dt)
    x3 = jnp.asarray(rng.random((B, h8, w8, 256), np.float32), dt)
    fpn = FPN()
    v = fpn.init(key, x1, x2, x3)
    fwd = jax.jit(lambda v_, a, b, c: fpn.apply(v_, a, b, c))
    g = jax.jit(jax.grad(
        lambda v_, a, b, c: sum((o.astype(jnp.float32) ** 2).sum()
                                for o in fpn.apply(v_, a, b, c))))
    tf = timeit(fwd, v, x1, x2, x3, iters=args.iters)
    tb = timeit(g, v, x1, x2, x3, iters=args.iters)
    fl = gflops["fpn"] * B
    print(f"{'fpn':<8} fwd {tf:7.2f} ms ({fl / tf / 1e9:6.1f} TF/s, "
          f"MFU {fl / (tf / 1e3) / PEAK_BF16 * 100:4.1f}%)   "
          f"fwd+bwd {tb:7.2f} ms (MFU "
          f"{3 * fl / (tb / 1e3) / PEAK_BF16 * 100:4.1f}%)", flush=True)
    total_fwd += tf
    total_bwd += tb

    # whole backbone for cross-check against the stage sum
    bb = ResNetFPN(dtype=dt)
    x = jnp.asarray(rng.random((B, H, W, 1), np.float32), dt)
    v = bb.init(key, x)
    fwd = jax.jit(lambda v_, x_: bb.apply(v_, x_))
    g = jax.jit(jax.grad(
        lambda v_, x_: sum((o.astype(jnp.float32) ** 2).sum()
                           for o in bb.apply(v_, x_))))
    tf = timeit(fwd, v, x, iters=args.iters)
    tb = timeit(g, v, x, iters=args.iters)
    fl = sum(gflops.values()) * B
    print(f"{'FULL':<8} fwd {tf:7.2f} ms ({fl / tf / 1e9:6.1f} TF/s, "
          f"MFU {fl / (tf / 1e3) / PEAK_BF16 * 100:4.1f}%)   "
          f"fwd+bwd {tb:7.2f} ms (MFU "
          f"{3 * fl / (tb / 1e3) / PEAK_BF16 * 100:4.1f}%)")
    print(f"stage sums: fwd {total_fwd:.2f} ms  fwd+bwd {total_bwd:.2f} ms  "
          f"(sum > FULL indicates per-call overhead, ~25 ms tunnel floor "
          f"per jit call)")
    print(f"analytic GFLOP/image: "
          + ", ".join(f"{k} {v / 1e9:.1f}" for k, v in gflops.items()))


if __name__ == "__main__":
    main()
