"""Multi-host metric aggregation.

Replaces the reference's pickled-object gloo gather (reference:
model/loftr_src/utils/comm.py:84-219) with fixed-shape collectives: metric
pytrees are aggregated across processes via multihost utils when running
multi-host, and passed through unchanged on a single host.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def all_gather_metrics(metrics: Dict[str, Any]) -> Dict[str, Any]:
    """Gather per-host metric arrays across all processes (concatenated on
    the leading axis). Single-process: identity."""
    if jax.process_count() == 1:
        return metrics
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda x: np.asarray(
            multihost_utils.process_allgather(np.asarray(x))).reshape(
                -1, *np.asarray(x).shape[1:]),
        metrics)


def host_mean(value) -> float:
    """Mean of a scalar across hosts."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    return float(np.mean(multihost_utils.process_allgather(
        np.asarray(value, np.float32))))
