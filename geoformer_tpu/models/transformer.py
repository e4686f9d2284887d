"""LoFTR encoder layers and interleaved self/cross stacks (flax.linen).

Re-design of the reference transformer
(reference: model/loftr_src/loftr/loftr_module/transformer.py:9-104 and
model/geo_transformer/transformer.py:10-67): bias-free QKV/merge projections,
linear or full attention, LayerNorm after merge, a concat-MLP
(Linear 2d->2d, act, Linear 2d->d, bias-free), second LayerNorm, residual add.
The coarse/fine stacks use ReLU in the MLP; the geo stack uses Tanh.

``EncoderLayer`` exposes two call paths sharing the same parameters:
  * ``__call__`` — token-set attention (self or cross),
  * ``window_call`` — per-query windowed KV attention, the batched equivalent
    of the GAM's per-sample L=1 loops (geo_transformer/transformer.py:125-139).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from geoformer_tpu.ops.attention import (
    full_attention,
    linear_attention,
    window_cross_attention,
)


class Int8Dense(nn.Module):
    """Bias-free dense computed in dynamic int8 (ops/quantize.int8_dense).

    Param tree ({"kernel": [Cin, Cout]} f32, lecun_normal init) matches
    nn.Dense(use_bias=False) exactly, so checkpoints load unchanged.
    Eval-only: round() has zero gradient (the model asserts not-train).
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from geoformer_tpu.ops.quantize import int8_dense

        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        return int8_dense(x, kernel).astype(self.dtype)


class EncoderLayer(nn.Module):
    d_model: int
    nhead: int
    attention: str = "linear"  # 'linear' | 'full'
    mlp_act: str = "relu"      # 'relu' | 'tanh'
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False   # TPU kernel for masked-KV full attention
    int8: bool = False         # eval-only dynamic int8 projections/MLP

    def setup(self):
        mk = (lambda f, name: Int8Dense(f, dtype=self.dtype, name=name)) \
            if self.int8 else \
            (lambda f, name: nn.Dense(f, use_bias=False, dtype=self.dtype,
                                      name=name))
        dense = lambda name: mk(self.d_model, name)  # noqa: E731
        self.q_proj = dense("q_proj")
        self.k_proj = dense("k_proj")
        self.v_proj = dense("v_proj")
        self.merge = dense("merge")
        self.mlp0 = mk(2 * self.d_model, "mlp0")
        self.mlp1 = mk(self.d_model, "mlp1")
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")

    def _heads(self, x):
        return x.reshape(*x.shape[:-1], self.nhead, self.d_model // self.nhead)

    def _finish(self, x, message):
        b, l = x.shape[0], x.shape[1]
        message = self.merge(message.reshape(b, l, self.d_model))
        message = self.norm1(message)
        act = nn.relu if self.mlp_act == "relu" else nn.tanh
        y = jnp.concatenate([x, message], axis=-1)
        y = self.norm2(self.mlp1(act(self.mlp0(y))))
        return x + y

    def __call__(self, x, source, x_mask=None, source_mask=None,
                 zero_empty_rows: bool = False, mask_fill: float = -1e9):
        """x: [B, L, C] queries; source: [B, S, C] keys/values."""
        if self.attention == "linear_flat":
            # [B, L, C]-layout linear attention (ops/attention.py:61-123):
            # math-identical to 'linear'; avoids the head-split relayouts.
            # Only ever selected for the FINE stack (short 25-token windows,
            # VERDICT r3 #8) — measured slower at coarse shapes.
            from geoformer_tpu.ops.attention import linear_attention_flat

            message = linear_attention_flat(
                self.q_proj(x), self.k_proj(source), self.v_proj(source),
                self.nhead, x_mask, source_mask)
            return self._finish(x, message)
        q = self._heads(self.q_proj(x))
        k = self._heads(self.k_proj(source))
        v = self._heads(self.v_proj(source))
        if self.attention == "linear":
            message = linear_attention(q, k, v, x_mask, source_mask)
        elif (self.use_pallas and x_mask is None and source_mask is not None
              and not zero_empty_rows):
            from geoformer_tpu.ops.pallas_attention import masked_kv_attention

            message = masked_kv_attention(q, k, v, source_mask,
                                          mask_fill=mask_fill)
        else:
            message = full_attention(q, k, v, x_mask, source_mask,
                                     mask_fill=mask_fill,
                                     zero_empty_rows=zero_empty_rows)
        return self._finish(x, message)

    def project_kv(self, source):
        """K/V projections over a token set [B, S, C] -> ([B,S,H,D] x2).
        Projecting once and gathering windows afterwards is math-identical to
        projecting gathered windows (linear ops commute with gather) at 1/W^2
        of the FLOPs."""
        return self._heads(self.k_proj(source)), \
            self._heads(self.v_proj(source))

    def window_attend(self, x, k_win, v_win, window_mask=None,
                      mask_fill: float = -1e8):
        """Windowed attention with pre-projected, pre-gathered K/V
        ([B, L, W, H, D])."""
        q = self._heads(self.q_proj(x))
        message = window_cross_attention(q, k_win, v_win, window_mask,
                                         mask_fill=mask_fill)
        return self._finish(x, message)

    def box_window_call(self, x, source, centers, grid_hw, radius: int,
                        mask_fill: float = -1e8):
        """Gather-free windowed attention (TPU): each query attends to the
        (2r+1)^2 box of destination cells around its warped center, computed
        as an on-chip mask over the full pre-projected token set
        (ops/pallas_attention.box_window_attention). Math-identical to
        window_call on gathered windows."""
        from geoformer_tpu.ops.pallas_attention import box_window_attention

        q = self._heads(self.q_proj(x))
        k = self._heads(self.k_proj(source))
        v = self._heads(self.v_proj(source))
        message = box_window_attention(q, k, v, centers, grid_hw, radius,
                                       mask_fill)
        return self._finish(x, message)

    def window_call(self, x, window_kv, window_mask=None,
                    mask_fill: float = -1e8):
        """Per-query windowed attention.

        Args:
            x: [B, L, C] queries.
            window_kv: [B, L, W, C] per-query gathered KV windows.
            window_mask: [B, L, W] validity (all-invalid rows -> zero message).
        """
        q = self._heads(self.q_proj(x))
        k = self._heads(self.k_proj(window_kv))
        v = self._heads(self.v_proj(window_kv))
        message = window_cross_attention(q, k, v, window_mask,
                                         mask_fill=mask_fill)
        return self._finish(x, message)


class LocalFeatureTransformer(nn.Module):
    """Interleaved self/cross encoder stack over two token sets
    (reference: loftr_module/transformer.py:63-104)."""

    d_model: int
    nhead: int
    layer_names: Sequence[str]
    attention: str = "linear"
    dtype: jnp.dtype = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, feat0, feat1, mask0=None, mask1=None):
        for i, name in enumerate(self.layer_names):
            layer = EncoderLayer(self.d_model, self.nhead, self.attention,
                                 dtype=self.dtype, int8=self.int8,
                                 name=f"layer_{i}")
            if name == "self":
                feat0 = layer(feat0, feat0, mask0, mask0)
                feat1 = layer(feat1, feat1, mask1, mask1)
            elif name == "cross":
                # Sequential, as in the reference: feat1 attends to the
                # already-updated feat0 (transformer.py:98-100).
                feat0 = layer(feat0, feat1, mask0, mask1)
                feat1 = layer(feat1, feat0, mask1, mask0)
            else:
                raise KeyError(name)
        return feat0, feat1
