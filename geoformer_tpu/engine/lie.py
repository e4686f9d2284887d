"""Lie group utilities: SO(3)/SE(3) exp/log maps (pure JAX, f32-stable).

Foundation for the SLAM/SfM engine layer — camera poses live in se(3)
tangent coordinates [w, v] (rotation first) during optimization.

All small-angle ratios use the double-where trick (safe argument inside,
select outside) so forward-mode autodiff through these maps never produces
NaN at the identity — the pose-graph/BA Jacobians differentiate through them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small-angle switch for the series branches. In f32 the closed forms break
# down long before 1e-5: (1 - cos th) is exactly 0 for th < ~3e-4, which
# turns A/(2B) into inf inside se3_log. At 1e-2 the two-term series are
# accurate to ~1e-12 relative, so switching this early costs nothing.
_EPS = 1e-2


def hat(w: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 3, 3] skew-symmetric."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -w[..., 2], w[..., 1]], -1),
        jnp.stack([w[..., 2], zeros, -w[..., 0]], -1),
        jnp.stack([-w[..., 1], w[..., 0], zeros], -1),
    ], axis=-2)


def _safe_ratios(w: jax.Array):
    """A = sin(th)/th, B = (1-cos th)/th^2, C = (th - sin th)/th^3, all
    NaN-free in value and derivative at th = 0."""
    th2 = (w ** 2).sum(-1, keepdims=True)[..., None]
    small = th2 < _EPS ** 2
    th2_safe = jnp.where(small, 1.0, th2)
    th = jnp.sqrt(th2_safe)
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - th2 / 24.0, (1 - jnp.cos(th)) / th2_safe)
    C = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                  (th - jnp.sin(th)) / (th2_safe * th))
    return th2, A, B, C


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues. [..., 3] -> [..., 3, 3]."""
    _, A, B, _ = _safe_ratios(w)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A * W + B * (W @ W)


def so3_log(R: jax.Array) -> jax.Array:
    """[..., 3, 3] -> [..., 3]."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1) / 2, -1 + 1e-7, 1 - 1e-7)
    vee = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                     R[..., 0, 2] - R[..., 2, 0],
                     R[..., 1, 0] - R[..., 0, 1]], -1)
    small = cos > 1.0 - _EPS ** 2
    cos_safe = jnp.where(small, 0.0, cos)
    th = jnp.arccos(cos_safe)
    # th/(2 sin th): series 1/2 + th^2/12 near zero
    ratio_big = th / (2 * jnp.sin(th))
    th2_approx = 2 * (1.0 - cos)  # th^2 + O(th^4)
    ratio = jnp.where(small, 0.5 + th2_approx / 12.0, ratio_big)
    return ratio[..., None] * vee


def se3_exp(xi: jax.Array) -> jax.Array:
    """[..., 6] (w, v) -> [..., 4, 4] homogeneous transform."""
    w, v = xi[..., :3], xi[..., 3:]
    _, A, B, C = _safe_ratios(w)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + A * W + B * (W @ W)
    V = eye + B * W + C * (W @ W)
    t = (V @ v[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], -1)
    bottom = jnp.broadcast_to(
        jnp.array([0, 0, 0, 1], xi.dtype), top.shape[:-2] + (4,))[..., None, :]
    return jnp.concatenate([top, bottom], -2)


def se3_log(T: jax.Array) -> jax.Array:
    """[..., 4, 4] -> [..., 6] (w, v)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    th2, A, B, _ = _safe_ratios(w)
    small = th2 < _EPS ** 2
    th2_safe = jnp.where(small, 1.0, th2)
    W = hat(w)
    # V^{-1} = I - W/2 + coef * W^2, coef = (1 - A/(2B))/th^2 -> 1/12 at 0
    coef = jnp.where(small, 1.0 / 12.0 + th2 / 720.0,
                     (1.0 - A / (2 * B)) / th2_safe)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), R.shape)
    Vinv = eye - W / 2 + coef * (W @ W)
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([w, v], -1)


def se3_apply(T: jax.Array, pts: jax.Array) -> jax.Array:
    """T [..., 4, 4] applied to pts [..., N, 3]."""
    return jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], pts) \
        + T[..., None, :3, 3]
