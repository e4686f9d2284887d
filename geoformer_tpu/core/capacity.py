"""Fixed-capacity selection utilities.

The reference relies on data-dependent shapes everywhere (`torch.where` at
coarse_matching.py:186, per-sample inlier sets in geo_module.py, fine gather of
M windows). On TPU all shapes must be static, so the central primitive is
"select up to CAP elements satisfying a mask, pad the rest, return a validity
mask". Built on cumsum + scatter; O(N) and fully jit/vmap compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_select_capacity(mask: jax.Array, capacity: int):
    """Compact the indices where ``mask`` is True into a fixed-size buffer.

    Args:
        mask: [N] boolean.
        capacity: static output size.

    Returns:
        (idx, valid): idx [capacity] int32 indices into the original axis
        (0 for padding slots), valid [capacity] bool. Selection keeps the first
        ``capacity`` True positions in index order.
    """
    n = mask.shape[0]
    mask = mask.astype(jnp.int32)
    pos = jnp.cumsum(mask) - 1  # target slot for each True element
    take = (mask > 0) & (pos < capacity)
    slots = jnp.where(take, pos, capacity)  # dump overflow/invalid into slot CAP
    src = jnp.arange(n, dtype=jnp.int32)
    idx = jnp.zeros((capacity + 1,), jnp.int32).at[slots].set(src, mode="drop")
    count = jnp.minimum(jnp.sum(mask), capacity)
    valid = jnp.arange(capacity) < count
    return idx[:capacity], valid


def topk_select(score: jax.Array, valid: jax.Array, capacity: int):
    """Select indices of the ``capacity`` highest-scoring valid entries.

    Args:
        score: [N] float scores.
        valid: [N] bool.
        capacity: static output size.

    Returns:
        (idx, out_valid): idx [capacity] int32, out_valid [capacity] bool.
    """
    neg = jnp.finfo(score.dtype).min
    masked = jnp.where(valid, score, neg)
    _, idx = jax.lax.top_k(masked, capacity)
    out_valid = jnp.take(valid, idx)
    return idx.astype(jnp.int32), out_valid


def scatter_onehot_2d(shape, rows: jax.Array, cols: jax.Array, valid: jax.Array,
                      dtype=jnp.float32):
    """Build a dense [H, W] one-hot map with ones at (rows[k], cols[k]) for valid k."""
    flat = jnp.zeros((shape[0] * shape[1],), dtype)
    lin = rows * shape[1] + cols
    lin = jnp.where(valid, lin, shape[0] * shape[1])  # drop invalid
    flat = flat.at[lin].set(1.0, mode="drop")
    return flat.reshape(shape)
