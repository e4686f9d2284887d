"""Planar SLAM demo: matcher -> pairwise RANSAC homographies -> SL(3) graph.

Generates a synthetic planar camera sweep (chained homographies over one
textured scene), matches consecutive frames (+ a loop closure to frame 0)
with the trained GeoFormer, fits pairwise homographies with the on-device
RANSAC, chains them into a trajectory, then optimizes the SL(3) pose graph.
Reports mean corner drift against ground truth before/after optimization —
the homography-world ATE of the BASELINE north star.

Usage:
    python scripts/slam_demo.py --ckpt checkpoints/tpu_r3_main/params_final.npz
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/tpu_r3_main/params_final.npz")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--seed", type=int, default=20260817)
    args = ap.parse_args()

    from geoformer_tpu.core.cache import enable_compile_cache
    from geoformer_tpu.core.platform import respect_platform_env

    respect_platform_env()
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from geoformer_tpu.config import (
        GeoFormerConfig,
        GeoModuleConfig,
        MatchConfig,
    )
    from geoformer_tpu.data.native import native_textures, native_warp
    from geoformer_tpu.engine.homography_graph import (
        HomographyGraph,
        optimize_homography_graph,
        sl3_exp,
    )
    from geoformer_tpu.eval.hpatches import fit_homography_np
    from geoformer_tpu.geometry.homography import corner_error
    from geoformer_tpu.models import GeoFormer
    from geoformer_tpu.train.checkpoint import load_variables

    H, W = args.height, args.width
    K = args.frames
    rng = np.random.default_rng(args.seed)

    # --- ground-truth camera sweep (frame k view of the plane)
    base = native_textures(1, H, W, args.seed)[0]
    Hs_gt = [np.eye(3, dtype=np.float32)]
    for k in range(1, K):
        xi = rng.normal(0, 0.015, 8).astype(np.float32)
        xi[4] = rng.normal(0, 12.0)
        xi[5] = rng.normal(0, 12.0)
        xi[6:] *= 1e-4
        Hs_gt.append(np.asarray(sl3_exp(jnp.asarray(xi))) @ Hs_gt[-1])
    Hs_gt = np.stack(Hs_gt)
    frames = native_warp(np.repeat(base[None], K, 0), Hs_gt)

    # --- matcher
    cfg = GeoFormerConfig(
        match=MatchConfig(max_matches=1024),
        geo=GeoModuleConfig(ransac_iters=256, max_inliers=1024),
    )
    model = GeoFormer(cfg)
    variables = load_variables(args.ckpt)

    @jax.jit
    def fwd(v, i0, i1):
        return model.apply(v, i0, i1, rngs={"ransac": jax.random.key(0)})

    # batch the pair list into B=4 forwards (reuses the bench-compiled graph)
    pairs = [(k, k + 1) for k in range(K - 1)] + [(0, K - 1)]
    B = 4
    while len(pairs) % B:
        pairs.append(pairs[-1])
    results = []
    for s in range(0, len(pairs), B):
        chunk = pairs[s:s + B]
        i0 = jnp.asarray(np.stack([frames[a] for a, _ in chunk])[..., None])
        i1 = jnp.asarray(np.stack([frames[b] for _, b in chunk])[..., None])
        out = fwd(variables, i0, i1)
        for bi in range(B):
            results.append((np.asarray(out.fine.valid[bi]),
                            np.asarray(out.fine.mkpts0[bi]),
                            np.asarray(out.fine.mkpts1[bi])))

    ei, ej, eH, weights = [], [], [], []
    seen = set()
    for (a, b), (ok, mk0a, mk1a) in zip(pairs, results):
        if (a, b) in seen:
            continue
        seen.add((a, b))
        mk0 = mk0a[ok]
        mk1 = mk1a[ok]
        Hp, inl = fit_homography_np(mk0, mk1, thr=3.0)
        if Hp is None:
            print(f"pair {a}->{b}: fit failed ({ok.sum()} matches)")
            continue
        gt = Hs_gt[b] @ np.linalg.inv(Hs_gt[a])
        err = float(corner_error(jnp.asarray(Hp, jnp.float32),
                                 jnp.asarray(gt), (H, W)))
        # edge information weight: inverse RMS of the inlier reprojection
        # residual under the fitted H (a live uncertainty estimate)
        ph = np.concatenate([mk0, np.ones((len(mk0), 1))], 1) @ Hp.T
        proj = ph[:, :2] / ph[:, 2:]
        res = np.linalg.norm(proj - mk1, axis=1)[inl]
        rms = float(np.sqrt((res ** 2).mean())) if inl.any() else 10.0
        w = 1.0 / max(rms, 0.05)
        print(f"pair {a}->{b}: {ok.sum()} matches, "
              f"{int(inl.sum())} inliers, rms {rms:.2f}px, "
              f"pair corner err {err:.2f}px")
        ei.append(a)
        ej.append(b)
        eH.append(Hp.astype(np.float32))
        weights.append(w * (3.0 if (a, b) == (0, K - 1) else 1.0))

    # --- chain odometry, then optimize the graph
    H0 = [np.eye(3, dtype=np.float32)]
    for k in range(K - 1):
        H0.append(eH[k] @ H0[-1])
    H0 = np.stack(H0)

    np.savez("/tmp/slam_edges.npz", H0=H0, ei=np.asarray(ei), ej=np.asarray(ej),
             eH=np.stack(eH), weights=np.asarray(weights), Hs_gt=Hs_gt)
    graph = HomographyGraph(
        H=jnp.asarray(H0), edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32), edge_H=jnp.asarray(np.stack(eH)),
        edge_valid=jnp.ones(len(ei), bool),
        edge_weight=jnp.asarray(weights, jnp.float32))
    opt, _ = optimize_homography_graph(graph, iters=20)

    def drift(Hset):
        return float(np.mean([
            float(corner_error(jnp.asarray(np.asarray(Hset[k], np.float32)),
                               jnp.asarray(Hs_gt[k]), (H, W)))
            for k in range(K)]))

    print(json.dumps({
        "frames": K,
        "corner_drift_chained_px": round(drift(H0), 3),
        "corner_drift_optimized_px": round(drift(np.asarray(opt)), 3),
    }))


if __name__ == "__main__":
    main()
