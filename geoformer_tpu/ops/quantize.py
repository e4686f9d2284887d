"""Dynamic int8 quantization for serving (backbone convolutions).

TPU v5e executes s8 x s8 -> s32 on the MXU at 2x the bf16 peak (394 vs 197
TOP/s), and the backbone is the largest compute-bound forward stage
(52.5% MFU fwd+bwd, RESULTS.md). This module provides an opt-in,
EVAL-ONLY int8 path: symmetric dynamic quantization — per-tensor scale for
activations, per-output-channel scales for weights — with s32 accumulation
and float dequantization. Parameters stay f32 on disk and in checkpoints;
quantization happens inside the jitted forward, so converted reference
checkpoints (utils/torch_convert.py) work unchanged.

The reference framework has no quantized path (pure f32 torch); this is a
TPU-native serving feature, off by default (`BackboneConfig.int8`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def quantize_symmetric(
    x: jax.Array,
    axis: Optional[Sequence[int]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization: returns (q, scale) with x ~= q * scale.

    axis=None: one scale for the whole tensor (activations).
    axis=(...): max-abs reduced over those axes, scale broadcastable
    against x (weights: reduce over all but the output-channel axis).
    """
    x = x.astype(jnp.float32)
    amax = (jnp.max(jnp.abs(x)) if axis is None
            else jnp.max(jnp.abs(x), axis=tuple(axis), keepdims=True))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def int8_dense(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """[..., Cin] x [Cin, Cout] matmul in int8 with s32 accumulation.

    Per-tensor activation scale, per-output-column weight scales. Same
    error model as int8_conv; used by the transformer projections/MLPs
    when the eval-only int8 path extends past the backbone.
    """
    xq, sx = quantize_symmetric(x)
    wq, sw = quantize_symmetric(kernel, axis=(0,))   # [1, Cout]
    y = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (sx * sw.reshape(
        (1,) * (y.ndim - 1) + (-1,)))


def int8_conv(
    x: jax.Array,
    kernel: jax.Array,
    strides: Tuple[int, int],
    padding,
) -> jax.Array:
    """NHWC x HWIO convolution computed in int8 with s32 accumulation.

    Output (f32) = conv(q(x), q(w)) * scale_x * scale_w[out_channel].
    Error vs the f32 conv is bounded by the two rounding steps (<= 0.5
    quantum each); tests pin cosine similarity > 0.999 on random tensors.
    """
    xq, sx = quantize_symmetric(x)
    wq, sw = quantize_symmetric(kernel, axis=(0, 1, 2))  # per-Cout scale
    y = jax.lax.conv_general_dilated(
        xq, wq, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (sx * sw.reshape(1, 1, 1, -1))
