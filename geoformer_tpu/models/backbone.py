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


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, name=name)
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

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        """x: [B, H, W, 1] grayscale in [0, 1]. Returns (coarse_1_8, fine_1_2)."""
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        d1, d2, d3 = self.block_dims

        x0 = nn.relu(bn("bn1")(nn.Conv(
            self.initial_dim, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="conv1")(x)))

        x1 = BasicBlock(d1, 1, self.dtype, name="layer1_0")(x0, train)
        x1 = BasicBlock(d1, 1, self.dtype, name="layer1_1")(x1, train)   # 1/2
        x2 = BasicBlock(d2, 2, self.dtype, name="layer2_0")(x1, train)
        x2 = BasicBlock(d2, 1, self.dtype, name="layer2_1")(x2, train)   # 1/4
        x3 = BasicBlock(d3, 2, self.dtype, name="layer3_0")(x2, train)
        x3 = BasicBlock(d3, 1, self.dtype, name="layer3_1")(x3, train)   # 1/8

        conv1x1 = lambda f, name: nn.Conv(  # noqa: E731
            f, (1, 1), use_bias=False, dtype=self.dtype, name=name)
        conv3x3 = lambda f, name: nn.Conv(  # noqa: E731
            f, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name=name)

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

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        d1, d2, d3, d4 = self.block_dims

        x0 = nn.relu(bn("bn1")(nn.Conv(
            self.initial_dim, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="conv1")(x)))

        x1 = BasicBlock(d1, 1, self.dtype, name="layer1_0")(x0, train)
        x1 = BasicBlock(d1, 1, self.dtype, name="layer1_1")(x1, train)   # 1/2
        x2 = BasicBlock(d2, 2, self.dtype, name="layer2_0")(x1, train)
        x2 = BasicBlock(d2, 1, self.dtype, name="layer2_1")(x2, train)   # 1/4
        x3 = BasicBlock(d3, 2, self.dtype, name="layer3_0")(x2, train)
        x3 = BasicBlock(d3, 1, self.dtype, name="layer3_1")(x3, train)   # 1/8
        x4 = BasicBlock(d4, 2, self.dtype, name="layer4_0")(x3, train)
        x4 = BasicBlock(d4, 1, self.dtype, name="layer4_1")(x4, train)   # 1/16

        conv1x1 = lambda f, name: nn.Conv(  # noqa: E731
            f, (1, 1), use_bias=False, dtype=self.dtype, name=name)
        conv3x3 = lambda f, name: nn.Conv(  # noqa: E731
            f, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name=name)

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
    if tuple(cfg.resolution) == (8, 2):
        return ResNetFPN(cfg.initial_dim, cfg.block_dims, dtype=dtype,
                         name=name)
    if tuple(cfg.resolution) == (16, 4):
        assert len(cfg.block_dims) == 4, cfg.block_dims
        return ResNetFPN_16_4(cfg.initial_dim, cfg.block_dims, dtype=dtype,
                              name=name)
    raise ValueError(f"unsupported resolution ladder {cfg.resolution}")
