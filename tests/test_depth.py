"""Depth warp + epipolar geometry tests with analytic oracles."""

import jax.numpy as jnp
import numpy as np

from geoformer_tpu.geometry.depth import (
    essential_from_pose,
    relative_pose_error,
    symmetric_epipolar_distance,
    warp_kpts_depth,
)


def _setup_translation(tx=10.0, d=5.0, h=64, w=80, f=100.0):
    """Flat scene at depth d, pure camera translation tx along x.
    Projection shift: dx = -f * tx / d."""
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    depth0 = np.full((1, h, w), d, np.float32)
    depth1 = np.full((1, h, w), d, np.float32)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = tx
    return K, depth0, depth1, T


def test_warp_kpts_pure_translation():
    f, d, tx = 100.0, 5.0, 1.0
    K, depth0, depth1, T = _setup_translation(tx=tx, d=d, f=f)
    kpts = np.array([[[40.0, 32.0], [20.0, 10.0]]], np.float32)
    valid, warped = warp_kpts_depth(
        jnp.asarray(kpts), jnp.asarray(depth0), jnp.asarray(depth1),
        jnp.asarray(T[None]), jnp.asarray(K[None]), jnp.asarray(K[None]))
    # x' = x + f*tx/z
    expect = kpts.copy()
    expect[..., 0] += f * tx / d
    np.testing.assert_allclose(np.asarray(warped), expect, atol=0.05)
    assert bool(valid.all())


def test_warp_kpts_zero_depth_invalid():
    K, depth0, depth1, T = _setup_translation(tx=1.0)
    depth0[0, 10, 20] = 0.0
    kpts = np.array([[[20.0, 10.0], [40.0, 32.0]]], np.float32)
    valid, _ = warp_kpts_depth(
        jnp.asarray(kpts), jnp.asarray(depth0), jnp.asarray(depth1),
        jnp.asarray(T[None]), jnp.asarray(K[None]), jnp.asarray(K[None]))
    assert not bool(valid[0, 0])
    assert bool(valid[0, 1])


def test_warp_kpts_depth_inconsistency_masks():
    K, depth0, depth1, T = _setup_translation(tx=1.0)
    depth1[:] = 50.0  # wildly different -> inconsistent
    kpts = np.array([[[40.0, 32.0]]], np.float32)
    valid, _ = warp_kpts_depth(
        jnp.asarray(kpts), jnp.asarray(depth0), jnp.asarray(depth1),
        jnp.asarray(T[None]), jnp.asarray(K[None]), jnp.asarray(K[None]))
    assert not bool(valid[0, 0])


def test_epipolar_distance_zero_for_true_matches():
    f, d, tx = 100.0, 5.0, 2.0
    K, depth0, depth1, T = _setup_translation(tx=tx, d=d, f=f)
    kpts = np.array([[[40.0, 32.0], [30.0, 20.0], [60.0, 50.0]]], np.float32)
    valid, warped = warp_kpts_depth(
        jnp.asarray(kpts), jnp.asarray(depth0), jnp.asarray(depth1),
        jnp.asarray(T[None]), jnp.asarray(K[None]), jnp.asarray(K[None]))
    E = essential_from_pose(jnp.asarray(T[None]))[0]
    d2 = symmetric_epipolar_distance(
        jnp.asarray(kpts[0]), warped[0], E, jnp.asarray(K), jnp.asarray(K))
    assert float(jnp.max(d2)) < 1e-6


def test_relative_pose_error_identity():
    T = np.eye(4)
    T[0, 3] = 1.0
    t_err, r_err = relative_pose_error(T, np.eye(3), np.array([1.0, 0, 0]))
    assert t_err < 1e-3 and r_err < 1e-3


def test_relative_pose_error_rotation():
    T = np.eye(4)
    T[0, 3] = 1.0
    th = np.deg2rad(10)
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    _, r_err = relative_pose_error(T, R, np.array([1.0, 0, 0]))
    assert abs(r_err - 10.0) < 1e-3
