"""GAM substage decomposition at bench shapes (fwd-only, bf16+pallas).

The round-3 verdict pinned the GAM stage at ~10% MFU; this rig splits the
stage into RANSAC sub-parts (sampling / 4-pt solves / scoring / IRLS polish)
and the four attention layers so the optimization target is a number, not a
guess. Usage:

    python scripts/profile_gam.py [--batch 8] [--iters 256] [--f32]
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
    print(f"{label:<44} {dt:8.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=256, help="RANSAC hypotheses")
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    from geoformer_tpu.core.cache import enable_compile_cache
    from geoformer_tpu.core.platform import respect_platform_env

    respect_platform_env()
    enable_compile_cache()

    from geoformer_tpu.config import GeoFormerConfig, GeoModuleConfig, MatchConfig
    from geoformer_tpu.geometry.homography import four_point_homography
    from geoformer_tpu.geometry.ransac import (
        _reproj_err2,
        dlt_homography,
        ransac_homography,
    )
    from geoformer_tpu.models.coarse_matching import coarse_match
    from geoformer_tpu.models.geo_module import GeoModule, _build_geo_state
    from geoformer_tpu.models.transformer import EncoderLayer

    B, H, W = args.batch, 480, 640
    hc, wc = H // 8, W // 8
    L = hc * wc
    N = 1024  # match capacity
    K = args.iters
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    print(f"== GAM decomposition  B={B}  L={L}  N={N}  K={K}  {dtype.__name__} ==")

    # --- realistic correspondences: ~75% inliers of a ground-truth H ---
    Hgt = jnp.asarray([[0.95, 0.05, 12.0], [-0.04, 0.98, -6.0],
                       [1e-5, 2e-5, 1.0]], jnp.float32)
    pts0 = jnp.asarray(rng.random((B, N, 2), np.float32) *
                       np.array([W - 1, H - 1], np.float32))
    from geoformer_tpu.geometry.homography import warp_points
    clean = warp_points(pts0, Hgt)
    noise = jnp.asarray(rng.normal(0, 40, (B, N, 2)).astype(np.float32))
    out_mask = jnp.asarray(rng.random((B, N)) < 0.25)
    pts1 = jnp.where(out_mask[..., None], clean + noise, clean)
    valid = jnp.ones((B, N), bool)
    keys = jax.random.split(key, B)

    # --- 1. RANSAC sub-parts, each an isolated jit -------------------------
    def sample(key, valid):
        g = jax.random.gumbel(key, (K, N))
        scores = jnp.where(valid[None, :], g, -jnp.inf)
        _, sample_idx = jax.lax.top_k(scores, 4)
        return sample_idx

    sample_j = jax.jit(jax.vmap(sample))
    idx = sample_j(keys, valid)
    timeit(sample_j, keys, valid, label="ransac.sample (gumbel + top_k4)")

    def solve(p0, p1, idx):
        return jax.vmap(four_point_homography)(p0[idx], p1[idx])

    solve_j = jax.jit(jax.vmap(solve))
    Hs = solve_j(pts0, pts1, idx)
    timeit(solve_j, pts0, pts1, idx, label=f"ransac.solve ({K}x 8x8 /sample)")

    def score(Hs, p0, p1, valid):
        err2 = jax.vmap(_reproj_err2, in_axes=(0, None, None))(Hs, p0, p1)
        inl = (err2 < 64.0) & valid[None, :]
        finite = jnp.isfinite(Hs).all(axis=(1, 2))
        counts = jnp.where(finite, inl.sum(-1), -1)
        best = jnp.argmax(counts)
        return Hs[best], inl[best]

    score_j = jax.jit(jax.vmap(score, in_axes=(0, 0, 0, 0)))
    timeit(score_j, Hs, pts0, pts1, valid, label="ransac.score (KxN reproj + argmax)")

    def polish(p0, p1, w):
        return dlt_homography(p0, p1, w)

    polish_j = jax.jit(jax.vmap(polish))
    wts = valid.astype(jnp.float32)
    timeit(polish_j, pts0, pts1, wts, label="ransac.polish 1x (DLT: 9x9 eigh)")

    # full RANSAC
    rfn = jax.jit(jax.vmap(lambda k, a, b, v: ransac_homography(
        k, a, b, v, thr=8.0, iters=K, refine_iters=2)))
    timeit(rfn, keys, pts0, pts1, valid, label=f"RANSAC total ({K} hyps, 2 polish)")

    # --- 2. geo-state build (RANSAC + membership scatter) ------------------
    cfg = GeoModuleConfig(ransac_iters=K, max_inliers=1024, use_pallas=True)
    mcfg = MatchConfig(max_matches=N)
    f0 = jnp.asarray(rng.random((B, L, 256), np.float32))
    m = jax.jit(lambda a, b: coarse_match(a, b, 0.2, 0.1, N,
                                          streaming=True))(f0, f0 + 0.01)
    gs_j = jax.jit(lambda m, k: _build_geo_state(m, k, (hc, wc), (hc, wc), 8,
                                                 cfg))
    timeit(gs_j, m, key, label="build_geo_state (RANSAC + scatter)")

    # --- 3. attention layers ------------------------------------------------
    layer = EncoderLayer(256, 8, attention="full", mlp_act="tanh",
                         dtype=dtype, use_pallas=True)
    feat = jnp.asarray(rng.random((B, L, 256), np.float32), dtype)
    kv = jnp.asarray(rng.random((B, N, 256), np.float32), dtype)
    kv_ok = jnp.ones((B, N), bool)
    lvars = layer.init(key, feat[:1], kv[:1], None, kv_ok[:1])

    self_j = jax.jit(lambda v, f, kv, ok: layer.apply(
        v, f, kv, None, ok, mask_fill=-1e8))
    timeit(self_j, lvars, feat, kv, kv_ok, label="self layer (masked-KV, q=L kv=N)")

    centers = jnp.stack(
        [jnp.asarray(rng.integers(0, wc, (B, L)), jnp.int32),
         jnp.asarray(rng.integers(0, hc, (B, L)), jnp.int32)], -1)
    # raster-coherent centers (what a fitted H produces): identity-ish warp
    gy, gx = jnp.divmod(jnp.arange(L, dtype=jnp.int32), wc)
    centers = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None], (B, L, 2))
    cross_j = jax.jit(lambda v, f, s, c: layer.apply(
        v, f, s, c, (hc, wc), 2, method=layer.box_window_call))
    timeit(cross_j, lvars, feat, feat, centers, label="cross layer (box kernel, r=2)")

    # --- 4. whole GAM -------------------------------------------------------
    geo = GeoModule(cfg, 256, dtype=dtype)
    cnn = jnp.asarray(rng.random((B, hc, wc, 256), np.float32), dtype)
    gvars = geo.init({"params": key, "ransac": key}, cnn[:1], cnn[:1],
                     jax.tree.map(lambda x: x[:1], m), 8, key)
    gfn = jax.jit(lambda v, a, b, mm: geo.apply(
        v, a, b, mm, 8, jax.random.key(0)))
    timeit(gfn, gvars, cnn, cnn, m, label="GAM total (state + 2 self + 2 cross)")


if __name__ == "__main__":
    main()
