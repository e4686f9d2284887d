"""Device mesh + sharding helpers.

Replaces the reference's NCCL DDP / gloo side-channel comms stack (reference:
lightning/train_homo_geoformer.py:117-127, model/loftr_src/utils/comm.py:84-219)
with a jax.sharding.Mesh: gradient sync is a compiler-inserted psum under jit,
metric gathers are fixed-shape allgathers, and per-host data sharding is by
process index.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the first n_data) devices."""
    devices = jax.devices()
    if n_data is None:
        n_data = len(devices)
    dev = np.array(devices[:n_data]).reshape(n_data)
    return Mesh(dev, (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard leading (batch) axis across the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a pytree of host arrays with the batch axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def local_shard_slice(total: int, axis_name: str = "data") -> slice:
    """Per-process slice of a global batch (multi-host input pipeline).

    Mirrors the reference's per-rank data sharding (HomoDataset.py:40-45,
    utils/dataloader.py:6-23) using jax process indices.
    """
    n_proc = jax.process_count()
    per = total // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
