"""Planar SLAM pipeline (engine/slam.py): synthetic GT-driven matcher ->
pairwise fits -> chained odometry -> SL(3) graph optimization -> drift."""

import numpy as np
import jax.numpy as jnp

from geoformer_tpu.engine.slam import (
    build_edges,
    run_planar_slam,
    save_trajectory,
    trajectory_drift,
)
from geoformer_tpu.geometry.homography import warp_points


def test_build_edges():
    assert build_edges(4) == [(0, 1), (1, 2), (2, 3)]
    e = build_edges(5, loop_stride=3)
    assert (0, 3) in e and (1, 4) in e and (0, 1) in e


def _gt_trajectory(K, rng, hw):
    h, w = hw
    Hs = [np.eye(3, dtype=np.float32)]
    for k in range(1, K):
        d = np.eye(3, dtype=np.float32)
        d[0, 2] = rng.normal(0, 6)
        d[1, 2] = rng.normal(0, 6)
        d[0, 1] = rng.normal(0, 0.01)
        d[1, 0] = rng.normal(0, 0.01)
        Hs.append((d @ Hs[-1]).astype(np.float32))
    return np.stack(Hs)


def test_slam_recovers_trajectory(tmp_path):
    rng = np.random.default_rng(0)
    K, hw = 6, (96, 128)
    Hs_gt = _gt_trajectory(K, rng, hw)

    # synthetic matcher: grid points warped through the GT relative H + noise
    gx, gy = np.meshgrid(np.arange(8, 120, 8), np.arange(8, 88, 8))
    pts = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)

    def match_fn(i, j):
        rel = Hs_gt[j] @ np.linalg.inv(Hs_gt[i])
        warped = np.asarray(warp_points(jnp.asarray(pts), jnp.asarray(rel)))
        noise = rng.normal(0, 0.4, warped.shape).astype(np.float32)
        return pts, warped + noise

    frames = [np.zeros(hw, np.float32)] * K
    res = run_planar_slam(frames, match_fn, loop_stride=5)
    assert sum(e["ok"] for e in res["edges"]) == len(res["edges"])
    d_chained = trajectory_drift(res["H_chained"], Hs_gt, hw)
    d_opt = trajectory_drift(res["H_traj"], Hs_gt, hw)
    assert d_opt < 2.0, (d_chained, d_opt)
    assert d_opt <= d_chained + 0.2, (d_chained, d_opt)

    p = str(tmp_path / "traj.txt")
    save_trajectory(res["H_traj"], p)
    loaded = np.loadtxt(p)
    assert loaded.shape == (K, 10)
    np.testing.assert_allclose(loaded[:, 1:].reshape(K, 3, 3),
                               res["H_traj"], atol=1e-6)


def test_slam_survives_fit_failure():
    K, hw = 4, (96, 128)
    rng = np.random.default_rng(1)
    Hs_gt = _gt_trajectory(K, rng, hw)
    pts = np.stack(np.meshgrid(np.arange(8, 120, 16),
                               np.arange(8, 88, 16)), -1).reshape(-1, 2
                                                                  ).astype(
        np.float32)

    def match_fn(i, j):
        if (i, j) == (1, 2):
            return np.zeros((2, 2), np.float32), np.zeros((2, 2), np.float32)
        rel = Hs_gt[j] @ np.linalg.inv(Hs_gt[i])
        warped = np.asarray(warp_points(jnp.asarray(pts), jnp.asarray(rel)))
        return pts, warped

    res = run_planar_slam([np.zeros(hw)] * K, match_fn)
    bad = [e for e in res["edges"] if not e["ok"]]
    assert len(bad) == 1 and (bad[0]["i"], bad[0]["j"]) == (1, 2)
    assert res["H_traj"].shape == (K, 3, 3)
