"""ResNet-FPN feature backbone (flax.linen, NHWC).

Functional re-design of the reference backbone
(reference: model/loftr_src/loftr/backbone/resnet_fpn.py:43-118): a 1-channel
7x7/2 stem, three 2-block residual stages at 1/2, 1/4, 1/8, and a top-down FPN
returning coarse (1/8, block_dims[-1] ch) and fine (1/2, block_dims[0] ch)
feature maps. BatchNorm params/running stats stay f32 (flax param_dtype)
and flax computes batch statistics in promoted f32 internally, but the
normalized OUTPUT follows the module dtype: with dtype=f32 this is
bit-identical to before, while bf16 halves the inter-layer activation
traffic (the backbone is HBM-bound, not MXU-bound).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from geoformer_tpu.ops.resize import resize_bilinear_align_corners


class Int8Conv(nn.Module):
    """Bias-free NHWC conv computed in dynamic int8 (ops/quantize.py).

    Param tree ({"kernel": [kh, kw, Cin, Cout]} f32, lecun_normal init)
    matches nn.Conv exactly, so f32 checkpoints load unchanged and the
    int8 toggle never forks the parameter structure. Eval-only: round()
    has zero gradient, so callers assert not-train before using it.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Sequence[Tuple[int, int]] = ((0, 0), (0, 0))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from geoformer_tpu.ops.quantize import int8_conv

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, x.shape[-1], self.features), jnp.float32)
        return int8_conv(x, kernel, self.strides,
                         [tuple(p) for p in self.padding]).astype(self.dtype)


def _make_conv(int8: bool, dtype):
    """Conv factory shared by the backbone modules: nn.Conv, or the
    quantized drop-in when the eval-only int8 path is enabled."""
    def conv(features, k, s, name):
        pad = [(k // 2, k // 2)] * 2
        if int8:
            return Int8Conv(features, (k, k), strides=(s, s), padding=pad,
                            dtype=dtype, name=name)
        return nn.Conv(features, (k, k), strides=(s, s), padding=pad,
                       use_bias=False, dtype=dtype, name=name)
    return conv


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert not (self.int8 and train), "int8 backbone is eval-only"
        conv = lambda f, k, s, name: _make_conv(self.int8, self.dtype)(  # noqa: E731
            f, k, s, name)
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)

        y = nn.relu(bn("bn1")(conv(self.planes, 3, self.stride, "conv1")(x)))
        y = bn("bn2")(conv(self.planes, 3, 1, "conv2")(y))
        if self.stride != 1:
            x = bn("bn_down")(conv(self.planes, 1, self.stride, "conv_down")(x))
        return nn.relu(x + y)


class ResNetFPN(nn.Module):
    initial_dim: int = 128
    block_dims: Sequence[int] = (128, 196, 256)
    dtype: jnp.dtype = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        """x: [B, H, W, 1] grayscale in [0, 1]. Returns (coarse_1_8, fine_1_2)."""
        assert not (self.int8 and train), "int8 backbone is eval-only"
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        d1, d2, d3 = self.block_dims
        mk = _make_conv(self.int8, self.dtype)

        x0 = nn.relu(bn("bn1")(mk(self.initial_dim, 7, 2, "conv1")(x)))

        block = lambda f, s, name: BasicBlock(  # noqa: E731
            f, s, self.dtype, int8=self.int8, name=name)
        x1 = block(d1, 1, "layer1_0")(x0, train)
        x1 = block(d1, 1, "layer1_1")(x1, train)   # 1/2
        x2 = block(d2, 2, "layer2_0")(x1, train)
        x2 = block(d2, 1, "layer2_1")(x2, train)   # 1/4
        x3 = block(d3, 2, "layer3_0")(x2, train)
        x3 = block(d3, 1, "layer3_1")(x3, train)   # 1/8

        conv1x1 = lambda f, name: mk(f, 1, 1, name)  # noqa: E731
        conv3x3 = lambda f, name: mk(f, 3, 1, name)  # noqa: E731

        # FPN top-down with align-corners bilinear upsampling.
        x3_out = conv1x1(d3, "l3_out")(x3)

        x2_out = conv1x1(d3, "l2_out")(x2)
        x3_up = resize_bilinear_align_corners(x3_out, x2_out.shape[1:3])
        m2 = x2_out + x3_up
        m2 = conv3x3(d3, "l2_m1")(m2)
        m2 = nn.leaky_relu(bn("l2_bn")(m2), negative_slope=0.01)
        x2_out = conv3x3(d2, "l2_m2")(m2)

        x1_out = conv1x1(d2, "l1_out")(x1)
        x2_up = resize_bilinear_align_corners(x2_out, x1_out.shape[1:3])
        m1 = x1_out + x2_up
        m1 = conv3x3(d2, "l1_m1")(m1)
        m1 = nn.leaky_relu(bn("l1_bn")(m1), negative_slope=0.01)
        x1_out = conv3x3(d1, "l1_m2")(m1)

        return x3_out, x1_out


class ResNetFPN_16_4(nn.Module):
    """Alternative (1/16, 1/4) resolution ladder (reference:
    model/loftr_src/loftr/backbone/resnet_fpn.py:121-199): four residual
    stages, FPN top-down from 1/16 merged down to 1/4 only. Returns coarse
    at 1/16 (block_dims[3] ch) and fine at 1/4 (block_dims[1] ch)."""

    initial_dim: int = 128
    block_dims: Sequence[int] = (128, 196, 256, 512)
    dtype: jnp.dtype = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        assert not (self.int8 and train), "int8 backbone is eval-only"
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        d1, d2, d3, d4 = self.block_dims
        mk = _make_conv(self.int8, self.dtype)

        x0 = nn.relu(bn("bn1")(mk(self.initial_dim, 7, 2, "conv1")(x)))

        block = lambda f, s, name: BasicBlock(  # noqa: E731
            f, s, self.dtype, int8=self.int8, name=name)
        x1 = block(d1, 1, "layer1_0")(x0, train)
        x1 = block(d1, 1, "layer1_1")(x1, train)   # 1/2
        x2 = block(d2, 2, "layer2_0")(x1, train)
        x2 = block(d2, 1, "layer2_1")(x2, train)   # 1/4
        x3 = block(d3, 2, "layer3_0")(x2, train)
        x3 = block(d3, 1, "layer3_1")(x3, train)   # 1/8
        x4 = block(d4, 2, "layer4_0")(x3, train)
        x4 = block(d4, 1, "layer4_1")(x4, train)   # 1/16

        conv1x1 = lambda f, name: mk(f, 1, 1, name)  # noqa: E731
        conv3x3 = lambda f, name: mk(f, 3, 1, name)  # noqa: E731

        x4_out = conv1x1(d4, "l4_out")(x4)

        x3_out = conv1x1(d4, "l3_out")(x3)
        x4_up = resize_bilinear_align_corners(x4_out, x3_out.shape[1:3])
        m3 = conv3x3(d4, "l3_m1")(x3_out + x4_up)
        m3 = nn.leaky_relu(bn("l3_bn")(m3), negative_slope=0.01)
        x3_out = conv3x3(d3, "l3_m2")(m3)

        x2_out = conv1x1(d3, "l2_out")(x2)
        x3_up = resize_bilinear_align_corners(x3_out, x2_out.shape[1:3])
        m2 = conv3x3(d3, "l2_m1")(x2_out + x3_up)
        m2 = nn.leaky_relu(bn("l2_bn")(m2), negative_slope=0.01)
        x2_out = conv3x3(d2, "l2_m2")(m2)

        return x4_out, x2_out


def build_backbone(cfg, dtype=jnp.float32, name: str = "backbone"):
    """Select the ladder by (coarse, fine) resolution (reference:
    backbone/__init__.py:4-11 dispatches on config RESOLUTION)."""
    int8 = getattr(cfg, "int8", False)
    if tuple(cfg.resolution) == (8, 2):
        return ResNetFPN(cfg.initial_dim, cfg.block_dims, dtype=dtype,
                         int8=int8, name=name)
    if tuple(cfg.resolution) == (16, 4):
        assert len(cfg.block_dims) == 4, cfg.block_dims
        return ResNetFPN_16_4(cfg.initial_dim, cfg.block_dims, dtype=dtype,
                              int8=int8, name=name)
    raise ValueError(f"unsupported resolution ladder {cfg.resolution}")
