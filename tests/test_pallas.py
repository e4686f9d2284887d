"""Pallas kernel correctness (CPU fallback path + interpret-mode parity)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geoformer_tpu.ops.attention import full_attention
from geoformer_tpu.ops.pallas_attention import _mka_kernel, masked_kv_attention


def test_masked_kv_attention_fallback_matches_reference():
    rng = np.random.default_rng(0)
    b, l, s, h, d = 2, 8, 6, 2, 4
    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, s)) > 0.3)
    out = masked_kv_attention(q, k, v, mask)
    ref = full_attention(q, k, v, kv_mask=mask, mask_fill=-1e8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_mka_kernel_interpret_mode():
    """Run the forward Pallas kernel in interpreter mode on CPU via the real
    dispatch wiring (b > 1 covers the [B,1,S] mask block spec; l = 24 with
    tile=16 covers the divisor-tile selection: tl must land on 8)."""
    from geoformer_tpu.ops.pallas_attention import _mka_forward

    rng = np.random.default_rng(1)
    b, l, s, h, d = 2, 24, 8, 2, 4
    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, s)) > 0.3)

    out = _mka_forward(q, k, v, mask, -1e8, 16, interpret=True)
    ref = full_attention(q, k, v, kv_mask=mask, mask_fill=-1e8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_encoder_layer_pallas_flag_cpu_fallback():
    from geoformer_tpu.models.transformer import EncoderLayer

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 16)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32))
    mask = jnp.asarray(rng.random((2, 6)) > 0.3)
    l0 = EncoderLayer(16, 2, attention="full", use_pallas=False)
    l1 = EncoderLayer(16, 2, attention="full", use_pallas=True)
    params = l0.init(jax.random.key(0), x, src)
    a = l0.apply(params, x, src, None, mask, mask_fill=-1e8)
    b = l1.apply(params, x, src, None, mask, mask_fill=-1e8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_mka_bwd_kernel_interpret_matches_jnp():
    """The in-kernel backward (interpret mode) must equal the jnp backward."""
    from geoformer_tpu.ops.pallas_attention import (
        _mka_bwd_jnp,
        _mka_bwd_pallas,
    )

    rng = np.random.default_rng(7)
    b, l, s, h, d = 2, 16, 8, 2, 4
    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, s)) > 0.3)

    ref = _mka_bwd_jnp(q, k, v, mask, g, -1e8)
    got = _mka_bwd_pallas(q, k, v, mask, g, -1e8, tile=8, interpret=True)
    for a, b_ in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def _box_setup(b=2, hg=6, wg=8, h=2, d=4, radius=2, seed=11):
    rng = np.random.default_rng(seed)
    s = hg * wg
    l = s
    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    # centers wander off-grid to exercise partial and empty boxes
    centers = jnp.asarray(rng.integers(-4, wg + 4, size=(b, l, 2)),
                          jnp.int32)
    centers = centers.at[..., 1].set(
        jnp.asarray(rng.integers(-4, hg + 4, size=(b, l)), jnp.int32))
    return q, k, v, centers, (hg, wg), radius


def test_box_reference_matches_window_gather_path():
    """box mask over the full token set == gathering the (2r+1)^2 window."""
    from geoformer_tpu.models.geo_module import _window_cells
    from geoformer_tpu.ops.attention import window_cross_attention
    from geoformer_tpu.ops.pallas_attention import box_attention_reference

    rng = np.random.default_rng(4)
    b, hg, wg, h, d, scale = 2, 6, 8, 2, 4, 8
    s = hg * wg
    # mild random homographies around identity
    H = jnp.asarray(np.eye(3)[None] + 0.02 * rng.normal(size=(b, 3, 3)),
                    jnp.float32)
    cells, wmask = _window_cells(H, (hg, wg), (hg, wg), scale, 5)
    from geoformer_tpu.geometry.homography import warp_points
    from geoformer_tpu.models.coarse_matching import match_coords

    grid = match_coords(jnp.arange(s, dtype=jnp.int32), wg, scale)
    centers = jnp.floor(
        jnp.clip(warp_points(grid[None], H), -1e6, 1e6) / scale).astype(
        jnp.int32)

    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    kv = feat  # same tensor as both k and v for the comparison
    take = jax.vmap(lambda f, i: jnp.take(f, i, axis=0))
    k_win = take(feat, cells.reshape(b, -1)).reshape(b, s, 25, h, d)
    ref = window_cross_attention(q, k_win, k_win, wmask, mask_fill=-1e8)
    got = box_attention_reference(q, kv, kv, centers, (hg, wg), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_box_fwd_kernel_interpret_matches_reference():
    from geoformer_tpu.ops.pallas_attention import (
        _box_forward,
        box_attention_reference,
    )

    q, k, v, centers, grid_hw, r = _box_setup()
    # force_tiled=False pins the whole-KV arm (the round-3 default is the
    # tiled kernel, covered by test_box_fwd_tiled_* below)
    out, lse = _box_forward(q, k, v, centers, grid_hw, r, -1e8, 8, 8,
                            interpret=True, force_tiled=False)
    ref = box_attention_reference(q, k, v, centers, grid_hw, r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)
    assert lse is not None and lse.shape == (2, 48, 2)


def test_box_bwd_kernel_interpret_matches_reference():
    from geoformer_tpu.ops.pallas_attention import (
        _box_bwd_pallas,
        _box_forward,
        box_attention_reference,
    )

    q, k, v, centers, grid_hw, r = _box_setup(seed=12)
    out, lse = _box_forward(q, k, v, centers, grid_hw, r, -1e8, 8, 8,
                            interpret=True, force_tiled=False)
    g = jnp.asarray(np.random.default_rng(13).normal(
        size=q.shape).astype(np.float32))
    got = _box_bwd_pallas(q, k, v, centers, g, out, lse, grid_hw, r, -1e8,
                          8, 8, interpret=True)
    _, vjp = jax.vjp(lambda a, b_, c: box_attention_reference(
        a, b_, c, centers, grid_hw, r), q, k, v)
    ref = vjp(g)
    for a, b_ in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_masked_kv_attention_grad_matches_reference():
    rng = np.random.default_rng(3)
    b, l, s, h, d = 1, 6, 5, 2, 4
    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, s)) > 0.3)

    def f_ours(q, k, v):
        return (masked_kv_attention(q, k, v, mask) ** 2).sum()

    def f_ref(q, k, v):
        return (full_attention(q, k, v, kv_mask=mask,
                               mask_fill=-1e8) ** 2).sum()

    g_ours = jax.grad(f_ours, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4,
                                   atol=1e-5)


def test_box_fwd_tiled_kernel_interpret_matches_reference():
    """The kv-tiled online-softmax forward must match the reference (and the
    whole-KV kernel's LSE definition) across partial/empty boxes."""
    from geoformer_tpu.ops.pallas_attention import (
        _box_forward,
        box_attention_reference,
    )

    q, k, v, centers, grid_hw, r = _box_setup(seed=13)
    out, lse = _box_forward(q, k, v, centers, grid_hw, r, -1e8, 8, 16,
                            interpret=True, force_tiled=True)
    ref = box_attention_reference(q, k, v, centers, grid_hw, r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)
    # LSE must agree with the whole-KV kernel's (feeds the shared backward)
    _, lse_ref = _box_forward(q, k, v, centers, grid_hw, r, -1e8, 8, 16,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref),
                               rtol=1e-5, atol=1e-5)


def test_box_tiled_skip_clustered_centers():
    """Box-sparsity tile skipping: centers clustered in the TOP rows force
    most kv tiles to be skipped; fwd+bwd must still match the reference
    exactly (skipped tiles contribute exp(mask_fill)=0 either way)."""
    from geoformer_tpu.ops.pallas_attention import (
        _box_bwd_pallas,
        _box_forward,
        box_attention_reference,
    )

    rng = np.random.default_rng(21)
    b, hg, wg, h, d, r = 2, 8, 8, 2, 4, 1
    s = hg * wg
    l = s
    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    # all centers in rows 0-1 -> kv tiles covering rows 4+ skip entirely;
    # a few rows fully off-grid exercise the denom==0 LSE fallback
    centers = jnp.stack([
        jnp.asarray(rng.integers(0, wg, size=(b, l)), jnp.int32),
        jnp.asarray(rng.integers(-6, 2, size=(b, l)), jnp.int32),
    ], axis=-1)
    out, lse = _box_forward(q, k, v, centers, (hg, wg), r, -1e8, 8, 16,
                            interpret=True, force_tiled=True)
    ref = box_attention_reference(q, k, v, centers, (hg, wg), r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)
    assert np.isfinite(np.asarray(lse)).all()

    g = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))
    got = _box_bwd_pallas(q, k, v, centers, g, out, lse, (hg, wg), r, -1e8,
                          8, 16, interpret=True)
    _, vjp = jax.vjp(lambda a, b_, c: box_attention_reference(
        a, b_, c, centers, (hg, wg), r), q, k, v)
    refg = vjp(g)
    for a, b_ in zip(got, refg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)
