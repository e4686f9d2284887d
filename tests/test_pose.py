"""Pose estimation metric tests."""

import numpy as np

from geoformer_tpu.eval.pose import (
    aggregate_metrics,
    error_auc,
    pose_error_for_pair,
)


def _project(pts3d, K, R=np.eye(3), t=np.zeros(3)):
    cam = pts3d @ R.T + t
    uv = cam @ K.T
    return uv[:, :2] / uv[:, 2:]


def test_pose_recovery_synthetic():
    rng = np.random.default_rng(0)
    K = np.array([[400.0, 0, 320], [0, 400, 240], [0, 0, 1]])
    pts = rng.uniform([-2, -2, 4], [2, 2, 8], size=(200, 3))
    th = np.deg2rad(5)
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    t = np.array([0.5, 0.1, 0.02])
    uv0 = _project(pts, K)
    uv1 = _project(pts, K, R, t)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    t_err, r_err, inl = pose_error_for_pair(uv0, uv1, K, K, T)
    assert r_err < 0.5, r_err
    assert t_err < 2.0, t_err
    assert inl.mean() > 0.8


def test_pose_failure_too_few():
    K = np.eye(3)
    t_err, r_err, inl = pose_error_for_pair(
        np.zeros((3, 2)), np.zeros((3, 2)), K, K, np.eye(4))
    assert np.isinf(t_err) and np.isinf(r_err)


def test_error_auc_monotone():
    out = error_auc([1.0, 3.0, 8.0, 50.0], (5, 10, 20))
    assert 0 < out["auc@5"] < out["auc@10"] < out["auc@20"] < 1


def test_aggregate_dedups_pairs():
    m = {
        "identifiers": ["a", "a", "b"],
        "R_errs": [1.0, 1.0, 100.0],
        "t_errs": [1.0, 1.0, 100.0],
        "epi_errs": [np.array([1e-5]), np.array([1e-5]), np.array([1.0])],
    }
    out = aggregate_metrics(m)
    # duplicate 'a' counted once: errors = [1, 100] -> auc@5 ~ recall 0.5 area
    assert 0.3 < out["auc@5"] < 0.5
