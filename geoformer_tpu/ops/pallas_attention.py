"""Pallas TPU kernels for the attention hot paths.

masked_kv_attention: the GAM self-layer pattern — L query tokens attending to
a fixed-capacity masked KV set (S <= ~1024). The full KV block fits VMEM, so
the kernel tiles queries and keeps logits entirely on-chip instead of
materializing the [L, S, H] tensor in HBM as the XLA path does
(reference semantics: model/geo_transformer/geo_attention.py:47-101).

Falls back to the jnp implementation on non-TPU backends.

NOTE: pallas_call has no automatic VJP, so this kernel is inference-only for
now (config.geo.use_pallas defaults to False; training uses the jnp path).
A custom_vjp wrapping a backward kernel is the planned next step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geoformer_tpu.ops.attention import full_attention


def _mka_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, nhead: int,
                mask_fill: float):
    """One (batch, query-tile) program: full softmax attention over the
    resident KV block with column masking."""
    hd = q_ref.shape[2]
    d = hd // nhead
    scale = 1.0 / (d ** 0.5)

    mask = mask_ref[0, :] > 0                               # [S]
    for h in range(nhead):
        qh = q_ref[0, :, h * d:(h + 1) * d]                 # [TL, D]
        kh = k_ref[0, :, h * d:(h + 1) * d]                 # [S, D]
        vh = v_ref[0, :, h * d:(h + 1) * d]
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [TL, S]
        logits = jnp.where(mask[None, :], logits, mask_fill)
        attn = jax.nn.softmax(scale * logits, axis=1)
        o_ref[0, :, h * d:(h + 1) * d] = jnp.dot(
            attn, vh, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("mask_fill", "tile"))
def masked_kv_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                        kv_mask: jax.Array, mask_fill: float = -1e8,
                        tile: int = 512) -> jax.Array:
    """Flash-style masked-KV attention.

    Args:
        q: [B, L, H, D]; k, v: [B, S, H, D]; kv_mask: [B, S].
    Returns:
        [B, L, H, D], numerically matching
        full_attention(..., mask_fill=mask_fill).
    """
    if jax.default_backend() not in ("tpu",):
        return full_attention(q, k, v, kv_mask=kv_mask, mask_fill=mask_fill)

    b, l, h, d = q.shape
    s = k.shape[1]
    tl = min(tile, l)
    if l % tl != 0:
        return full_attention(q, k, v, kv_mask=kv_mask, mask_fill=mask_fill)

    qf = q.reshape(b, l, h * d)
    kf = k.reshape(b, s, h * d)
    vf = v.reshape(b, s, h * d)
    maskf = kv_mask.astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_mka_kernel, nhead=h, mask_fill=mask_fill),
        grid=(b, l // tl),
        in_specs=[
            pl.BlockSpec((1, tl, h * d), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, h * d), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, h * d), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda bi, i: (bi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tl, h * d), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, h * d), jnp.float32),
    )(qf, kf, vf, maskf)
    return out.reshape(b, l, h, d)
