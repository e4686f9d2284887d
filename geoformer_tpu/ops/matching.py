"""Dual-softmax matching confidence.

Mirrors CoarseMatching.forward / FineMatching2.forward math (reference:
model/loftr_src/loftr/utils/coarse_matching.py:110-127,
model/fine_matching2.py:53-62): features are normalized by sqrt(C), a
similarity matrix divided by a temperature, padding positions filled with -INF,
and the confidence is softmax over rows times softmax over columns.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dual_softmax(
    feat0: jax.Array,
    feat1: jax.Array,
    temperature: float = 0.1,
    mask0: Optional[jax.Array] = None,
    mask1: Optional[jax.Array] = None,
    inf: float = 1e9,
) -> jax.Array:
    """Confidence matrix from two token sets.

    Args:
        feat0: [B, L, C]; feat1: [B, S, C].
        mask0: [B, L]; mask1: [B, S] (1 = valid).
    Returns:
        conf: [B, L, S] = softmax_L(sim) * softmax_S(sim).
    """
    c = feat0.shape[-1]
    norm = 1.0 / jnp.sqrt(jnp.asarray(c, feat0.dtype))
    f0 = feat0 * norm
    f1 = feat1 * norm
    sim = jnp.einsum("blc,bsc->bls", f0, f1) / temperature
    if mask0 is not None and mask1 is not None:
        valid = mask0[:, :, None].astype(bool) & mask1[:, None, :].astype(bool)
        sim = jnp.where(valid, sim, -inf)
    return jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)


def mutual_nearest_mask(conf: jax.Array, thr: float) -> jax.Array:
    """Boolean mask of mutual-nearest-neighbor cells above threshold
    (reference: coarse_matching.py:177-180)."""
    row_max = conf == conf.max(axis=2, keepdims=True)
    col_max = conf == conf.max(axis=1, keepdims=True)
    return (conf > thr) & row_max & col_max
