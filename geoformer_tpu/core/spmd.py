"""Sequence-parallel (SPMD) sharding helpers.

The reference scales only by DDP data parallelism (one pair per GPU,
lightning/train_homo_geoformer.py:117-127); images that don't fit one device
simply can't be matched. Here a single high-resolution pair can be sharded
over the mesh *token* dimension instead: the backbone partitions spatially
(GSPMD inserts conv halo exchanges), the coarse linear-attention transformer
partitions over tokens (its KV/Ksum contractions become one psum each — the
elu feature map makes sequence parallelism exact, not an approximation), and
streamed match extraction partitions over image0 rows with logsumexp/argmax
merges across devices (ops/fused_loss.py). Capacity-bounded stages (RANSAC,
fine windows) stay replicated — they are O(max_matches), not O(L).

These helpers are no-ops when ``axis_name`` is None, so the same model code
serves both the replicated and the sequence-parallel paths. Callers activate
the path by jitting under ``jax.sharding.set_mesh`` (or ``Mesh`` context)
with a mesh that carries ``axis_name``.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import PartitionSpec as P


def shard_dim(x: jax.Array, axis_name: Optional[str], dim: int = 1):
    """Constrain ``x`` to be sharded over mesh axis ``axis_name`` on ``dim``.

    No-op when ``axis_name`` is None. Requires an ambient mesh (set_mesh /
    mesh context manager) when active.
    """
    if axis_name is None:
        return x
    spec = [None] * x.ndim
    spec[dim] = axis_name
    return jax.lax.with_sharding_constraint(x, P(*spec))


def replicate(x: jax.Array, axis_name: Optional[str]):
    """Constrain ``x`` to be fully replicated (no-op when axis_name is None)."""
    if axis_name is None:
        return x
    return jax.lax.with_sharding_constraint(x, P(*([None] * x.ndim)))
