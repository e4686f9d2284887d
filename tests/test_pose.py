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


# ---- on-device essential solver (geometry/essential.py) vs host cv2 ----

def _two_view(rng, n=300, outlier_frac=0.2, noise_px=0.5,
              angle_deg=8.0, t=(0.6, 0.15, 0.05)):
    K = np.array([[420.0, 0, 320], [0, 420, 240], [0, 0, 1]])
    pts = rng.uniform([-2, -2, 4], [2, 2, 9], size=(n, 3))
    th = np.deg2rad(angle_deg)
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    t = np.asarray(t, np.float64)
    uv0 = _project(pts, K)
    uv1 = _project(pts, K, R, t)
    uv0 += rng.normal(0, noise_px, uv0.shape)
    uv1 += rng.normal(0, noise_px, uv1.shape)
    n_out = int(n * outlier_frac)
    idx = rng.choice(n, n_out, replace=False)
    uv1[idx] = rng.uniform([0, 0], [640, 480], (n_out, 2))
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return uv0, uv1, K, T


def test_device_essential_matches_cv2_pose():
    """Device 8-point RANSAC recovers the same pose cv2 does (within noise)."""
    import jax
    import jax.numpy as jnp

    from geoformer_tpu.geometry.essential import batched_pose_errors

    rng = np.random.default_rng(7)
    host_errs, dev_errs = [], []
    B = 6
    uv0s, uv1s, K0s, Ts = [], [], [], []
    for b in range(B):
        uv0, uv1, K, T = _two_view(rng, angle_deg=4 + 2 * b)
        t_err, r_err, _ = pose_error_for_pair(uv0, uv1, K, K, T)
        host_errs.append(max(t_err, r_err))
        uv0s.append(uv0)
        uv1s.append(uv1)
        K0s.append(K)
        Ts.append(T)
    t_e, R_e, n_inl, ok = batched_pose_errors(
        jax.random.key(0),
        jnp.asarray(np.stack(uv0s), jnp.float32),
        jnp.asarray(np.stack(uv1s), jnp.float32),
        jnp.ones((B, uv0s[0].shape[0]), bool),
        jnp.asarray(np.stack(K0s), jnp.float32),
        jnp.asarray(np.stack(K0s), jnp.float32),
        jnp.asarray(np.stack(Ts), jnp.float32))
    assert bool(np.all(np.asarray(ok))), np.asarray(ok)
    dev_errs = np.maximum(np.asarray(t_e), np.asarray(R_e))
    # Both solvers recover the pose on every inlier-dominated pair; parity
    # is 'within noise', not bitwise (5-pt vs 8-pt, different RANSAC).
    assert np.all(dev_errs < 5.0), dev_errs
    assert np.all(np.abs(dev_errs - np.asarray(host_errs)) < 4.0), (
        dev_errs, host_errs)
    assert np.all(np.asarray(n_inl) > 100)


def test_device_essential_failure_modes():
    """Too-few / all-outlier correspondences return ok=False and inf errors."""
    import jax
    import jax.numpy as jnp

    from geoformer_tpu.geometry.essential import batched_pose_errors

    rng = np.random.default_rng(3)
    N = 64
    k0 = rng.uniform([0, 0], [640, 480], (2, N, 2)).astype(np.float32)
    k1 = rng.uniform([0, 0], [640, 480], (2, N, 2)).astype(np.float32)
    valid = np.zeros((2, N), bool)
    valid[1, :4] = True  # below min_valid
    K = np.tile(np.array([[420.0, 0, 320], [0, 420, 240], [0, 0, 1]],
                         np.float32), (2, 1, 1))
    T = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    t_e, R_e, _, ok = batched_pose_errors(
        jax.random.key(1), jnp.asarray(k0), jnp.asarray(k1),
        jnp.asarray(valid), jnp.asarray(K), jnp.asarray(K), jnp.asarray(T))
    assert not np.any(np.asarray(ok))
    assert np.all(np.isinf(np.asarray(t_e)))


def test_device_essential_clean_precision():
    """Noise-free correspondences give sub-degree pose on the device path."""
    import jax
    import jax.numpy as jnp

    from geoformer_tpu.geometry.essential import batched_pose_errors

    rng = np.random.default_rng(11)
    uv0, uv1, K, T = _two_view(rng, n=200, outlier_frac=0.0, noise_px=0.0)
    t_e, R_e, n_inl, ok = batched_pose_errors(
        jax.random.key(0),
        jnp.asarray(uv0[None], jnp.float32), jnp.asarray(uv1[None], jnp.float32),
        jnp.ones((1, 200), bool), jnp.asarray(K[None], jnp.float32),
        jnp.asarray(K[None], jnp.float32), jnp.asarray(T[None], jnp.float32))
    assert bool(ok[0])
    assert float(R_e[0]) < 0.3, float(R_e[0])
    assert float(t_e[0]) < 1.0, float(t_e[0])
    assert int(n_inl[0]) > 190
