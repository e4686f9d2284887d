"""Bilinear align-corners resize as two MXU-shaped interpolation matmuls.

The reference FPN uses F.interpolate(..., mode='bilinear', align_corners=True)
(reference: model/loftr_src/loftr/backbone/resnet_fpn.py:110-115).
jax.image.resize has no align_corners mode, so the (static) 1-D
interpolation matrices are applied per axis. HOW they are applied is the
whole game on TPU — round-5 device traces measured three layouts:

  1. einsum "pw,bowc->bopc" for the width pass: the contraction sits in a
     middle axis, XLA picks a degenerate tiling — 8.0 ms (the most
     expensive op in the forward).
  2. static 2-tap gather+lerp per axis: jnp.take on non-minor axes is
     gather-lowered and even slower — 10.2 ms.
  3. this version: the height pass contracts the SECOND-major axis of
     [B, h, (w*c)] (a clean [o,h] @ [h, w*c] matmul), and the width pass
     transposes c before w so it is again second-major — two cheap
     HBM-bandwidth transposes around a clean matmul. The 2-nonzeros-per-
     row FLOP overhead is irrelevant next to layout: these shapes run at
     MXU rates.
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
    b, h, w, c = x.shape
    oh, ow = out_hw
    Ah = jnp.asarray(_interp_matrix(h, oh)).astype(x.dtype)
    Aw = jnp.asarray(_interp_matrix(w, ow)).astype(x.dtype)
    # height: contract h as the second-major axis of [B, h, w*c]
    x = jnp.matmul(Ah, x.reshape(b, h, w * c)).reshape(b, oh, w, c)
    # width: move c before w so w is second-major, matmul, move back
    x = x.transpose(0, 1, 3, 2)                      # [B, oh, c, w]
    x = jnp.matmul(x, Aw.T)                          # [B, oh, c, ow]
    return x.transpose(0, 1, 3, 2)                   # [B, oh, ow, c]
