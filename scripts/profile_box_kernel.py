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
        box_attention_reference,
    )

    failures = []

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

    fwd_tol = 1e-3 if args.f32 else 0.1
    for label, centers in (("warped-real", centers_real),
                           ("random-worstcase", centers_rand)):
        tw, (ow, lw) = timeit(fwd_whole, q, k, v, centers)
        tt, (ot, lt) = timeit(fwd_tiled, q, k, v, centers)
        diff = float(jnp.abs(ot.astype(jnp.float32)
                             - ow.astype(jnp.float32)).max())
        # lse is only defined on rows whose box intersects the grid; on
        # fully-masked rows the two kernels legitimately disagree (out is
        # zero in both — verified by `diff` above which covers ALL rows).
        cx, cy = centers[..., 0], centers[..., 1]
        nonempty = ((cx + r >= 0) & (cx - r < wg)
                    & (cy + r >= 0) & (cy - r < hg))[..., None]
        ldiff = float(jnp.abs(jnp.where(nonempty, lt - lw, 0.0)).max())
        print(f"fwd  {label:<18} whole-KV {tw:7.2f} ms   tiled+skip "
              f"{tt:7.2f} ms   |out diff| {diff:.2e}  |lse diff| {ldiff:.2e}",
              flush=True)
        if diff > fwd_tol or ldiff > fwd_tol * 10:
            failures.append(f"fwd {label}: out {diff:.2e} lse {ldiff:.2e}")

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

    # --- backward NUMERICS on hardware, vs the jnp reference VJP ---
    # Small enough that the dense [B, L, S, H] reference fits HBM, but
    # multi-tile in BOTH grid dims (q and kv), which is what interpret-mode
    # tests cannot exercise: Pallas TPU only preserves accumulated output
    # blocks across CONSECUTIVE grid steps, so a wrong grid order shows up
    # only here (it corrupts dq silently on real hardware).
    hg2, wg2 = 24, 32
    s2 = hg2 * wg2                       # 768 -> 6 kv tiles of 128
    q2 = jnp.asarray(rng.normal(size=(1, s2, h, d)), jnp.float32)
    k2 = jnp.asarray(rng.normal(size=(1, s2, h, d)), jnp.float32)
    v2 = jnp.asarray(rng.normal(size=(1, s2, h, d)), jnp.float32)
    g2 = jnp.asarray(rng.normal(size=(1, s2, h, d)), jnp.float32)
    c2 = jnp.asarray(
        np.stack([rng.integers(-2, wg2 + 2, (1, s2)),
                  rng.integers(-2, hg2 + 2, (1, s2))], -1), jnp.int32)
    out2, lse2 = jax.jit(functools.partial(
        _box_forward, grid_hw=(hg2, wg2), radius=r, mask_fill=-1e8,
        q_tile=96, kv_tile=128, force_tiled=True))(q2, k2, v2, c2)
    got = _box_bwd_pallas(q2, k2, v2, c2, g2, out2, lse2, (hg2, wg2), r,
                          -1e8, 96, 128)
    _, vjp = jax.vjp(lambda a, b_, c: box_attention_reference(
        a, b_, c, c2, (hg2, wg2), r, -1e8), q2, k2, v2)
    ref = vjp(g2)
    names = ("dq", "dk", "dv")
    for name, a, b_ in zip(names, got, ref):
        scale_ref = float(jnp.abs(b_).max()) or 1.0
        rel = float(jnp.abs(a.astype(jnp.float32)
                            - b_.astype(jnp.float32)).max()) / scale_ref
        print(f"bwd numerics  {name}: max rel err {rel:.2e}", flush=True)
        # On hardware both the kernel and the jnp reference VJP run f32
        # matmuls at TPU DEFAULT precision (bf16 MXU passes) with
        # different contraction orders, so ~bf16-epsilon (3.9e-3)
        # disagreement is the noise floor, not a kernel defect (measured
        # 4.4e-3 max on 2026-08-19). Exact agreement is covered by the
        # interpret-mode tests in tests/test_pallas.py.
        if rel > 1e-2:
            failures.append(f"bwd {name}: rel err {rel:.2e}")

    if failures:
        print("NUMERICS FAILURES:\n  " + "\n  ".join(failures), flush=True)
        sys.exit(1)
    print("numerics OK", flush=True)


if __name__ == "__main__":
    main()
