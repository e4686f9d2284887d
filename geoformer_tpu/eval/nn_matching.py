"""Mutual nearest-neighbor descriptor matching baseline.

Re-implementation of the immatch NN matcher (reference:
eval_tool/immatch/modules/nn_matching.py:4-31): cosine similarity, mutual-NN
check, optional distance threshold — used to plug descriptor baselines into
the same eval harness.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def mutual_nn_match(desc0: jax.Array, desc1: jax.Array,
                    threshold: Optional[float] = None
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Match L2-normalized descriptors by mutual nearest neighbour.

    Args:
        desc0: [N0, D]; desc1: [N1, D].
        threshold: optional minimum cosine similarity.
    Returns:
        (idx0 [N0], valid [N0], sim [N0]): for each desc0, its desc1 match.
    """
    d0 = desc0 / jnp.maximum(jnp.linalg.norm(desc0, axis=-1, keepdims=True),
                             1e-8)
    d1 = desc1 / jnp.maximum(jnp.linalg.norm(desc1, axis=-1, keepdims=True),
                             1e-8)
    sim = d0 @ d1.T
    nn01 = sim.argmax(axis=1)
    nn10 = sim.argmax(axis=0)
    mutual = jnp.take(nn10, nn01) == jnp.arange(desc0.shape[0])
    best = sim.max(axis=1)
    valid = mutual
    if threshold is not None:
        valid = valid & (best > threshold)
    return nn01.astype(jnp.int32), valid, best
