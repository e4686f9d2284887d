"""A/B the box-window attention kernels at model shapes on TPU.

Compares the whole-KV-resident forward against the kv-tiled online-softmax
forward with box-sparsity tile skipping (each query's radius-2 box touches
25 of S=4800 keys; raster-coherent warped centers let most kv tiles skip
their MXU work entirely). Also validates numerics of the tiled+skip path
against the whole-KV kernel on-device.

    python scripts/profile_box_kernel.py [--batch 4] [--f32]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
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
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--kv-tile", type=int, default=480)
    ap.add_argument("--q-tile", type=int, default=120)
    args = ap.parse_args()

    from geoformer_tpu.core.cache import enable_compile_cache
    from geoformer_tpu.core.platform import respect_platform_env

    respect_platform_env()
    enable_compile_cache()
    from geoformer_tpu.geometry.homography import warp_points
    from geoformer_tpu.models.coarse_matching import match_coords
    from geoformer_tpu.ops.pallas_attention import (
        _box_bwd_pallas,
        _box_forward,
    )

    dt = jnp.float32 if args.f32 else jnp.bfloat16
    B, hg, wg, h, d, r = args.batch, 60, 80, 8, 32, 2
    s = hg * wg
    scale = 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, s, h, d)), dt)
    k = jnp.asarray(rng.normal(size=(B, s, h, d)), dt)
    v = jnp.asarray(rng.normal(size=(B, s, h, d)), dt)

    # realistic centers: mild rotation+scale+shift homography of the grid
    th = 0.15
    H = np.array([[np.cos(th) * 1.05, -np.sin(th), 40],
                  [np.sin(th), np.cos(th) * 0.95, -25],
                  [1e-5, -2e-5, 1.0]], np.float32)
    Hb = jnp.asarray(np.tile(H, (B, 1, 1)))
    grid = match_coords(jnp.arange(s, dtype=jnp.int32), wg, scale)
    centers_real = jnp.floor(
        jnp.clip(warp_points(grid[None], Hb), -1e6, 1e6) / scale
    ).astype(jnp.int32)
    # adversarial centers: random over the grid -> every tile overlaps
    centers_rand = jnp.asarray(
        np.stack([rng.integers(0, wg, (B, s)), rng.integers(0, hg, (B, s))],
                 -1), jnp.int32)

    print(f"== box kernel A/B  B={B} S={s} h={h} d={d} "
          f"{'f32' if args.f32 else 'bf16'}  q_tile={args.q_tile} "
          f"kv_tile={args.kv_tile} ==", flush=True)

    fwd_whole = jax.jit(functools.partial(
        _box_forward, grid_hw=(hg, wg), radius=r, mask_fill=-1e8,
        q_tile=args.q_tile, kv_tile=args.kv_tile, force_tiled=False))
    fwd_tiled = jax.jit(functools.partial(
        _box_forward, grid_hw=(hg, wg), radius=r, mask_fill=-1e8,
        q_tile=args.q_tile, kv_tile=args.kv_tile, force_tiled=True))

    for label, centers in (("warped-real", centers_real),
                           ("random-worstcase", centers_rand)):
        tw, (ow, lw) = timeit(fwd_whole, q, k, v, centers)
        tt, (ot, lt) = timeit(fwd_tiled, q, k, v, centers)
        diff = float(jnp.abs(ot.astype(jnp.float32)
                             - ow.astype(jnp.float32)).max())
        ldiff = float(jnp.abs(lt - lw).max())
        print(f"fwd  {label:<18} whole-KV {tw:7.2f} ms   tiled+skip "
              f"{tt:7.2f} ms   |out diff| {diff:.2e}  |lse diff| {ldiff:.2e}",
              flush=True)

    # backward (shared by both forwards)
    g = jnp.asarray(rng.normal(size=(B, s, h, d)), dt)
    for label, centers in (("warped-real", centers_real),
                           ("random-worstcase", centers_rand)):
        _, (out, lse) = timeit(fwd_tiled, q, k, v, centers, iters=1)
        bwd = jax.jit(functools.partial(
            _box_bwd_pallas, grid_hw=(hg, wg), radius=r, mask_fill=-1e8,
            q_tile=args.q_tile, kv_tile=args.kv_tile))
        tb, _ = timeit(bwd, q, k, v, centers, g, out, lse)
        print(f"bwd  {label:<18} tiled+skip {tb:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
