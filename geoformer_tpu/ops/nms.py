"""Non-maximum suppression on score maps (pure JAX).

Equivalent of simple_nms / torch_nms (reference:
utils/common_utils.py:101-135, 146-164): keep local maxima within a
(2r+1)^2 window via max-pooling, implemented with lax.reduce_window.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _maxpool(x: jax.Array, radius: int) -> jax.Array:
    """Same-shape max pool over (2r+1)^2 windows. x: [..., H, W]."""
    k = 2 * radius + 1
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1,) * (x.ndim - 2) + (k, k),
        window_strides=(1,) * x.ndim,
        padding=[(0, 0)] * (x.ndim - 2) + [(radius, radius)] * 2)


def simple_nms(scores: jax.Array, radius: int, key=None) -> jax.Array:
    """Zero out non-maximal scores. Ties within a window are broken by a tiny
    random perturbation (the reference's rand/10 trick) when a key is given."""
    is_max = scores == _maxpool(scores, radius)
    if key is not None:
        noise = jax.random.uniform(key, scores.shape) / 10.0
        noise = jnp.where(is_max, noise, 0.0)
        keep = (noise == _maxpool(noise, radius)) & (noise > 0)
    else:
        keep = is_max
    return jnp.where(keep, scores, 0.0)


def top_k_keypoints(scores: jax.Array, k: int):
    """Flattened top-k of a [H, W] score map -> ((x, y) [k, 2], scores [k])."""
    h, w = scores.shape
    vals, idx = jax.lax.top_k(scores.reshape(-1), k)
    xy = jnp.stack([idx % w, idx // w], axis=-1)
    return xy, vals
