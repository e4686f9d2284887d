"""Pallas TPU kernels for the attention hot paths.

masked_kv_attention: the GAM self-layer pattern — L query tokens attending to
a fixed-capacity masked KV set (S <= ~1024). The full KV block fits VMEM, so
the kernel tiles queries and keeps logits entirely on-chip instead of
materializing the [L, S, H] tensor in HBM as the XLA path does
(reference semantics: model/geo_transformer/geo_attention.py:47-101).

Falls back to the jnp implementation on non-TPU backends.

Training support: a custom VJP recomputes the attention weights in the
backward pass (flash-attention style residual-free recompute) using the jnp
path, so the forward kernel is usable under jax.grad.
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
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
    return _mka_forward(q, k, v, kv_mask, mask_fill, tile)


def _mka_forward(q, k, v, kv_mask, mask_fill, tile):
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


def _mka_fwd(q, k, v, kv_mask, mask_fill, tile):
    out = _mka_forward(q, k, v, kv_mask, mask_fill, tile)
    return out, (q, k, v, kv_mask)


def _mka_bwd(mask_fill, tile, res, g):
    q, k, v, kv_mask = res
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, q.dtype))
    logits = jnp.einsum("blhd,bshd->blsh", q, k)
    keep = kv_mask[:, None, :, None].astype(bool)
    logits = jnp.where(keep, logits, mask_fill)
    attn = jax.nn.softmax(scale * logits, axis=2)

    dv = jnp.einsum("blsh,blhd->bshd", attn, g)
    d_attn = jnp.einsum("blhd,bshd->blsh", g, v)
    dot = jnp.sum(attn * d_attn, axis=2, keepdims=True)
    d_logits = attn * (d_attn - dot) * scale
    d_logits = jnp.where(keep, d_logits, 0.0)
    dq = jnp.einsum("blsh,bshd->blhd", d_logits, k)
    dk = jnp.einsum("blsh,blhd->bshd", d_logits, q)
    if jnp.issubdtype(kv_mask.dtype, jnp.bool_) or \
            jnp.issubdtype(kv_mask.dtype, jnp.integer):
        import numpy as _np

        dmask = _np.zeros(kv_mask.shape, dtype=jax.dtypes.float0)
    else:
        dmask = jnp.zeros(kv_mask.shape, kv_mask.dtype)
    return dq, dk, dv, dmask


masked_kv_attention.defvjp(_mka_fwd, _mka_bwd)
