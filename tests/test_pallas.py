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
    """Run the actual Pallas kernel in interpreter mode on CPU."""
    rng = np.random.default_rng(1)
    b, l, s, h, d = 1, 16, 8, 2, 4
    q = rng.normal(size=(b, l, h * d)).astype(np.float32)
    k = rng.normal(size=(b, s, h * d)).astype(np.float32)
    v = rng.normal(size=(b, s, h * d)).astype(np.float32)
    mask = (rng.random((b, s)) > 0.3).astype(np.float32)

    tl = 8
    out = pl.pallas_call(
        functools.partial(_mka_kernel, nhead=h, mask_fill=-1e8),
        grid=(b, l // tl),
        in_specs=[
            pl.BlockSpec((1, tl, h * d), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, s, h * d), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, s, h * d), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, s), lambda bi, i: (bi, 0)),
        ],
        out_specs=pl.BlockSpec((1, tl, h * d), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, l, h * d), jnp.float32),
        interpret=True,
    )(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask))

    ref = full_attention(
        jnp.asarray(q.reshape(b, l, h, d)), jnp.asarray(k.reshape(b, s, h, d)),
        jnp.asarray(v.reshape(b, s, h, d)),
        kv_mask=jnp.asarray(mask) > 0, mask_fill=-1e8)
    np.testing.assert_allclose(np.asarray(out).reshape(b, l, h, d),
                               np.asarray(ref), rtol=1e-4, atol=1e-5)


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
