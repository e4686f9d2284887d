"""Dynamic int8 serving path (ops/quantize.py + backbone int8 toggle).

The reference framework is pure-f32 torch with no quantized path; this is a
TPU-native serving feature (v5e int8 MXU peak = 2x bf16), eval-only and off
by default.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoformer_tpu.config import BackboneConfig
from geoformer_tpu.models.backbone import build_backbone
from geoformer_tpu.ops.quantize import int8_conv, quantize_symmetric


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_quantize_symmetric_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 8)).astype(np.float32)) * 3.0
    q, s = quantize_symmetric(x)
    assert q.dtype == jnp.int8 and s.ndim == 0
    # dequantization error bounded by half a quantum
    err = np.abs(np.asarray(q, np.float32) * float(s) - np.asarray(x))
    assert err.max() <= float(s) * 0.5 + 1e-6

    # per-output-channel weight scales broadcast against the kernel
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 12)).astype(np.float32))
    qw, sw = quantize_symmetric(w, axis=(0, 1, 2))
    assert sw.shape == (1, 1, 1, 12)
    errw = np.abs(np.asarray(qw, np.float32) * np.asarray(sw) - np.asarray(w))
    assert errw.max() <= float(np.max(sw)) * 0.5 + 1e-6


def test_int8_conv_close_to_f32_conv():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 12, 14, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 16, 24)).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = int8_conv(x, w, (1, 1), [(1, 1), (1, 1)])
    assert got.shape == ref.shape
    assert _cos(got, ref) > 0.999
    # strided + 1x1 variants (the other shapes the backbone uses)
    ref2 = jax.lax.conv_general_dilated(
        x, w[:1, :1], window_strides=(2, 2), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got2 = int8_conv(x, w[:1, :1], (2, 2), [(0, 0), (0, 0)])
    assert got2.shape == ref2.shape and _cos(got2, ref2) > 0.999


@pytest.mark.parametrize("resolution,block_dims", [
    ((8, 2), (32, 40, 48)),
    ((16, 4), (32, 40, 48, 56)),
])
@pytest.mark.slow
def test_backbone_int8_matches_f32(resolution, block_dims):
    cfg = BackboneConfig(initial_dim=32, block_dims=block_dims,
                         resolution=resolution)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 64, 80, 1)).astype(np.float32))

    bb_f32 = build_backbone(cfg)
    variables = bb_f32.init(jax.random.key(0), x)
    c_ref, f_ref = bb_f32.apply(variables, x)

    bb_q = build_backbone(dataclasses.replace(cfg, int8=True))
    # identical param tree: the f32 variables drive the int8 graph directly
    c_q, f_q = bb_q.apply(variables, x)
    assert c_q.shape == c_ref.shape and f_q.shape == f_ref.shape
    assert _cos(c_q, c_ref) > 0.99, _cos(c_q, c_ref)
    assert _cos(f_q, f_ref) > 0.99, _cos(f_q, f_ref)


def test_int8_dense_close_to_f32_matmul():
    from geoformer_tpu.ops.quantize import int8_dense

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(3, 17, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32) * 0.2)
    ref = x @ w
    got = int8_dense(x, w)
    assert got.shape == ref.shape and _cos(got, ref) > 0.999


def test_encoder_layer_int8_matches_f32():
    from geoformer_tpu.models.transformer import EncoderLayer

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 24, 32)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(2, 20, 32)).astype(np.float32))
    layer = EncoderLayer(32, 4, attention="full")
    variables = layer.init(jax.random.key(0), x, s)
    ref = layer.apply(variables, x, s)
    got = EncoderLayer(32, 4, attention="full", int8=True).apply(
        variables, x, s)
    assert got.shape == ref.shape
    assert _cos(got, ref) > 0.99, _cos(got, ref)


@pytest.mark.slow
def test_full_model_runs_with_int8_everywhere():
    """--int8-full config: backbone + coarse/fine/geo transformer stacks all
    quantized, driven by the same f32 variables."""
    from geoformer_tpu.config import (
        CoarseTransformerConfig,
        FineTransformerConfig,
        GeoFormerConfig,
        GeoModuleConfig,
        MatchConfig,
    )
    from geoformer_tpu.models import GeoFormer

    cfg = GeoFormerConfig(
        match=MatchConfig(max_matches=16, force_one_match=True),
        geo=GeoModuleConfig(ransac_iters=16, max_inliers=16),
    )
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.random((1, 64, 80, 1)).astype(np.float32))
    variables = GeoFormer(cfg).init(
        {"params": jax.random.key(0), "ransac": jax.random.key(0)}, img, img)

    qcfg = dataclasses.replace(
        cfg,
        backbone=dataclasses.replace(cfg.backbone, int8=True),
        coarse=CoarseTransformerConfig(int8=True),
        fine=FineTransformerConfig(int8=True),
        geo=dataclasses.replace(cfg.geo, int8=True),
    )
    out = GeoFormer(qcfg).apply(variables, img, img,
                                rngs={"ransac": jax.random.key(0)})
    assert bool(jnp.isfinite(out.fine.mkpts0).all())

    # int8 anywhere refuses the training path
    with pytest.raises(AssertionError, match="eval-only"):
        GeoFormer(dataclasses.replace(
            cfg, coarse=CoarseTransformerConfig(int8=True))).apply(
                variables, img, img, train=True, mutable=["batch_stats"],
                rngs={"ransac": jax.random.key(0)})


def test_backbone_int8_refuses_training():
    cfg = BackboneConfig(initial_dim=32, block_dims=(32, 40, 48), int8=True)
    bb = build_backbone(cfg)
    x = jnp.zeros((1, 32, 32, 1))
    with pytest.raises(AssertionError, match="eval-only"):
        bb.init(jax.random.key(0), x, train=True)


def test_full_model_runs_with_int8_backbone():
    from geoformer_tpu.config import (
        GeoFormerConfig,
        GeoModuleConfig,
        MatchConfig,
    )
    from geoformer_tpu.models import GeoFormer

    cfg = GeoFormerConfig(
        match=MatchConfig(max_matches=16, force_one_match=True),
        geo=GeoModuleConfig(ransac_iters=16, max_inliers=16),
    )
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((1, 64, 80, 1)).astype(np.float32))
    model = GeoFormer(cfg)
    variables = model.init({"params": jax.random.key(0),
                            "ransac": jax.random.key(0)}, img, img)

    qcfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, int8=True))
    out = GeoFormer(qcfg).apply(variables, img, img,
                                rngs={"ransac": jax.random.key(0)})
    assert bool(jnp.isfinite(out.fine.mkpts0).all())
