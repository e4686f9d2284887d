"""2-D sinusoidal position encoding.

Reproduces PositionEncodingSine (reference:
model/loftr_src/loftr/utils/position_encoding.py:6-42) including the released
checkpoints' "buggy" frequency schedule: with temp_bug_fix=False the reference
computes ``div_term = exp(arange(0, d//2, 2) * ((-log(1e4) / d) // 2))`` —
note the Python floor-division binding — which for d=256 collapses to
``exp(-2i)``. We keep both schedules for checkpoint compatibility.

Positions are 1-indexed (the reference builds them with cumsum over ones).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _pe_table(d_model: int, h: int, w: int, temp_bug_fix: bool) -> np.ndarray:
    """[h, w, d_model] float32 position encoding (NHWC)."""
    freq_idx = np.arange(0, d_model // 2, 2, dtype=np.float64)  # len d//4
    if temp_bug_fix:
        div_term = np.exp(freq_idx * (-math.log(10000.0) / (d_model // 2)))
    else:
        # faithful reproduction of the reference's operator-precedence bug
        div_term = np.exp(freq_idx * (-math.log(10000.0) / d_model // 2))
    div = div_term[None, None, :]                          # [1, 1, d//4]
    y = np.arange(1, h + 1, dtype=np.float64)[:, None, None]
    x = np.arange(1, w + 1, dtype=np.float64)[None, :, None]
    pe = np.zeros((h, w, d_model), np.float32)
    pe[:, :, 0::4] = np.sin(x * div)
    pe[:, :, 1::4] = np.cos(x * div)
    pe[:, :, 2::4] = np.sin(y * div)
    pe[:, :, 3::4] = np.cos(y * div)
    return pe


def add_position_encoding(feat, temp_bug_fix: bool = False):
    """feat: [B, H, W, C] -> feat + PE (broadcast over batch)."""
    _, h, w, c = feat.shape
    pe = jnp.asarray(_pe_table(c, h, w, temp_bug_fix))
    return feat + pe.astype(feat.dtype)
