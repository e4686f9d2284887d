"""Attention primitives for the coarse/fine/geo transformers.

Math mirrors the reference's three attention variants:
- LinearAttention (elu+1 feature map, O(N) KV aggregation, /v_length guard) —
  reference: model/loftr_src/loftr/loftr_module/linear_attention.py:15-51.
- FullAttention with padding-mask fill — same file :54-85.
- Geo FullAttention with -1e8 fill and zeroed all-masked rows — reference:
  model/geo_transformer/geo_attention.py:47-101 — plus a per-query windowed
  cross attention used by the GAM (each query owns a small gathered KV set).

Shapes are [B, L, H, D] (batch, tokens, heads, head_dim). All functions are
pure and fixed-shape; masks make padding exact.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _elu_feature_map(x: jax.Array) -> jax.Array:
    return jax.nn.elu(x) + 1.0


def linear_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_mask: Optional[jax.Array] = None,
    kv_mask: Optional[jax.Array] = None,
    eps: float = 1e-6,
) -> jax.Array:
    """O(N) linear attention ("Transformers are RNNs" style).

    Args:
        q: [B, L, H, D]; k, v: [B, S, H, D].
        q_mask: [B, L] bool/float; kv_mask: [B, S].
    Returns:
        [B, L, H, D].
    """
    Q = _elu_feature_map(q)
    K = _elu_feature_map(k)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None].astype(Q.dtype)
    if kv_mask is not None:
        kvm = kv_mask[:, :, None, None].astype(K.dtype)
        K = K * kvm
        v = v * kvm

    s = v.shape[1]
    v_scaled = v / s  # overflow guard, mirrors the reference exactly
    KV = jnp.einsum("bshd,bshv->bhdv", K, v_scaled)
    Ksum = K.sum(axis=1)                                   # [B, H, D]
    Z = 1.0 / (jnp.einsum("blhd,bhd->blh", Q, Ksum) + eps)
    out = jnp.einsum("blhd,bhdv->blhv", Q, KV) * Z[..., None] * s
    return out


def linear_attention_flat(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    nhead: int,
    q_mask: Optional[jax.Array] = None,
    kv_mask: Optional[jax.Array] = None,
    eps: float = 1e-6,
) -> jax.Array:
    """linear_attention computed entirely on [B, L, C] layouts.

    Math-identical to linear_attention (same elu+1 feature map, same /v_length
    guard) but head separation is enforced by a block-diagonal mask on one
    small [C, C] aggregate instead of reshaping activations to [B, L, H, D] —
    on TPU the head_dim-in-lane layouts (D = 16-32 << 128) waste most of each
    vector lane and force relayouts around every einsum; keeping C = H*D in
    the lane dimension leaves the big tensors untouched. The extra FLOPs of
    the masked full [C, C] products are ~H x on a term that is O(S*C^2),
    negligible next to the projections.

    MEASURED NEGATIVE RESULT (v5e, scripts/profile_linear_attn.py,
    2026-08-17): the flat variant is SLOWER than the per-head einsums at
    every model shape (coarse bf16 fwd+bwd 45.8 vs 24.6 ms; coarse f32
    70.6 vs 58.4; fine bf16 74.9 vs 59.8) — XLA handles the head-split
    layouts better than the hypothesis assumed. Re-run 2026-08-19:
    coarse negative again at both dtypes (66.4 vs 64.5 bf16, 110.7 vs
    104.9 f32) but fine bf16 FLIPPED (flat 86.2 vs per-head 92.4). A
    round-4 full-model A/B confirmed the fine-shape win end-to-end
    (+6.7% bench throughput, RESULTS.md), so FineTransformerConfig now
    DEFAULTS to the flat variant (config.py); the coarse transformer
    stays on per-head linear_attention where flat remains negative.

    Args:
        q: [B, L, C]; k, v: [B, S, C] (pre-head-split projections).
    Returns:
        [B, L, C].
    """
    b, l, c = q.shape
    s = k.shape[1]
    d = c // nhead
    Q = _elu_feature_map(q)
    K = _elu_feature_map(k)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None].astype(Q.dtype)
    if kv_mask is not None:
        kvm = kv_mask[:, :, None].astype(K.dtype)
        K = K * kvm
        v = v * kvm

    v_scaled = v / s
    # [B, C, C] aggregate; only the H diagonal [D, D] blocks are kept, which
    # makes Q @ KV act independently per head, exactly as the split layout.
    kv = jnp.einsum("bsc,bse->bce", K, v_scaled)
    blk = jnp.arange(c) // d
    kv = kv * (blk[:, None] == blk[None, :]).astype(kv.dtype)
    out = jnp.einsum("blc,bce->ble", Q, kv)                 # [B, L, C]

    # Per-head normalizer: Z_blh = 1 / (sum_d Q[b,l,(h,d)] Ksum[b,(h,d)] + eps)
    ksum = K.sum(axis=1)                                    # [B, C]
    z = 1.0 / (jnp.einsum("blc,bhc->blh", Q,
                          ksum[:, None, :] *
                          jax.nn.one_hot(blk, nhead,
                                         dtype=K.dtype).T[None]) + eps)
    return out * jnp.repeat(z, d, axis=-1) * s


def full_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_mask: Optional[jax.Array] = None,
    kv_mask: Optional[jax.Array] = None,
    mask_fill: float = -1e9,
    zero_empty_rows: bool = False,
) -> jax.Array:
    """Softmax attention with optional padding masks.

    ``zero_empty_rows`` reproduces the geo-attention edge case: queries whose
    entire KV set is masked produce an exactly-zero output
    (reference: geo_attention.py:98-100).
    """
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, q.dtype))
    logits = jnp.einsum("blhd,bshd->blsh", q, k)
    if q_mask is not None or kv_mask is not None:
        m = None
        if q_mask is not None:
            m = q_mask[:, :, None, None].astype(bool)
        if kv_mask is not None:
            km = kv_mask[:, None, :, None].astype(bool)
            m = km if m is None else (m & km)
        logits = jnp.where(m, logits, mask_fill)
    attn = jax.nn.softmax(scale * logits, axis=2)
    out = jnp.einsum("blsh,bshd->blhd", attn, v)
    if zero_empty_rows and kv_mask is not None:
        empty = (kv_mask.astype(jnp.int32).sum(-1) == 0)   # [B]
        out = jnp.where(empty[:, None, None, None], 0.0, out)
    return out


def window_cross_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    mask_fill: float = -1e8,
) -> jax.Array:
    """Per-query windowed attention: each query token owns its own tiny KV set.

    This is the batched form of the GAM cross layer, where the reference loops
    per sample and runs attention with L=1 per query over a 25-token gathered
    window (reference: model/geo_transformer/transformer.py:125-139).

    Args:
        q: [B, L, H, D] queries.
        k, v: [B, L, W, H, D] per-query windows.
        kv_mask: [B, L, W] validity of window entries. Queries whose window is
            entirely invalid get a zero output (geo_attention.py:98-100).
    Returns:
        [B, L, H, D].
    """
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, q.dtype))
    logits = jnp.einsum("blhd,blwhd->blwh", q, k)
    if kv_mask is not None:
        logits = jnp.where(kv_mask[..., None].astype(bool), logits, mask_fill)
    attn = jax.nn.softmax(scale * logits, axis=2)
    out = jnp.einsum("blwh,blwhd->blhd", attn, v)
    if kv_mask is not None:
        empty = kv_mask.astype(jnp.int32).sum(-1) == 0     # [B, L]
        out = jnp.where(empty[:, :, None, None], 0.0, out)
    return out
