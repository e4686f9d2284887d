"""Bilinear align-corners resize as two static-index 2-tap lerps.

The reference FPN uses F.interpolate(..., mode='bilinear', align_corners=True)
(reference: model/loftr_src/loftr/backbone/resnet_fpn.py:110-115).
jax.image.resize has no align_corners mode. The original implementation
built dense [out, in] interpolation matrices and applied them as matmuls —
but each row of that matrix has at most TWO nonzeros, so the matmul burns
~in_size/2 x the necessary FLOPs; a round-5 device trace booked the FPN's
width pass as the single most expensive op in the forward (8.0 ms of a
143 ms call). The 2-tap form (static gather + lerp per axis) is
bandwidth-bound instead and XLA fuses it with the surrounding convs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _taps(in_size: int, out_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """(lo indices [out], frac weights [out]) for align-corners lerp."""
    if out_size == 1 or in_size == 1:
        return (np.zeros(out_size, np.int32), np.zeros(out_size, np.float32))
    scale = (in_size - 1) / (out_size - 1)
    pos = np.arange(out_size) * scale
    lo = np.clip(np.floor(pos).astype(np.int32), 0, in_size - 2)
    frac = (pos - lo).astype(np.float32)
    return lo, frac


def _lerp_axis(x: jax.Array, out_size: int, axis: int) -> jax.Array:
    in_size = x.shape[axis]
    lo, frac = _taps(in_size, out_size)
    a = jnp.take(x, jnp.asarray(lo), axis=axis)
    b = jnp.take(x, jnp.asarray(lo + 1), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    f = jnp.asarray(frac).reshape(shape).astype(x.dtype)
    return a + (b - a) * f


def resize_bilinear_align_corners(x: jax.Array, out_hw) -> jax.Array:
    """Resize NHWC tensor spatially with align_corners=True bilinear."""
    oh, ow = out_hw
    x = _lerp_axis(x, oh, 1)
    x = _lerp_axis(x, ow, 2)
    return x
