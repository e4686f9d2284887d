"""Bilinear align-corners resize as dense interpolation matmuls.

The reference FPN uses F.interpolate(..., mode='bilinear', align_corners=True)
(reference: model/loftr_src/loftr/backbone/resnet_fpn.py:110-115).
jax.image.resize has no align_corners mode, so we build the (static-shape)
1-D interpolation matrices and apply them as two small matmuls — which is also
the MXU-friendly way to do it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] align-corners linear interpolation matrix."""
    A = np.zeros((out_size, in_size), np.float32)
    if out_size == 1 or in_size == 1:
        A[:, 0] = 1.0
        return A
    scale = (in_size - 1) / (out_size - 1)
    pos = np.arange(out_size) * scale
    lo = np.floor(pos).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2)
    frac = (pos - lo).astype(np.float32)
    A[np.arange(out_size), lo] = 1.0 - frac
    A[np.arange(out_size), lo + 1] = frac
    return A


def resize_bilinear_align_corners(x: jax.Array, out_hw) -> jax.Array:
    """Resize NHWC tensor spatially with align_corners=True bilinear."""
    _, h, w, _ = x.shape
    oh, ow = out_hw
    Ah = jnp.asarray(_interp_matrix(h, oh))
    Aw = jnp.asarray(_interp_matrix(w, ow))
    x = jnp.einsum("oh,bhwc->bowc", Ah, x)
    x = jnp.einsum("pw,bowc->bopc", Aw, x)
    return x
