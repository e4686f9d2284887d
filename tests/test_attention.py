"""Attention / matching kernels vs independent torch oracles.

The oracles are written from the published math (linear attention from
"Transformers are RNNs", masked softmax attention, dual-softmax from the LoFTR
paper) — not copied from the reference implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from geoformer_tpu.ops.attention import (
    full_attention,
    linear_attention,
    window_cross_attention,
)
from geoformer_tpu.ops.matching import dual_softmax, mutual_nearest_mask


def torch_linear_attention(q, k, v, q_mask=None, kv_mask=None, eps=1e-6):
    """Oracle: phi(x) = elu(x)+1 linear attention with the /S overflow guard."""
    Q = torch.nn.functional.elu(q) + 1
    K = torch.nn.functional.elu(k) + 1
    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None]
    if kv_mask is not None:
        K = K * kv_mask[:, :, None, None]
        v = v * kv_mask[:, :, None, None]
    s = v.shape[1]
    vs = v / s
    KV = torch.einsum("bshd,bshv->bhdv", K, vs)
    Z = 1.0 / (torch.einsum("blhd,bhd->blh", Q, K.sum(1)) + eps)
    return torch.einsum("blhd,bhdv,blh->blhv", Q, KV, Z) * s


def test_linear_attention_matches_oracle():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, 7, 4, 8)).astype(np.float32)
    k = rng.normal(size=(2, 9, 4, 8)).astype(np.float32)
    v = rng.normal(size=(2, 9, 4, 8)).astype(np.float32)
    ours = np.asarray(linear_attention(*map(jnp.asarray, (q, k, v))))
    ref = torch_linear_attention(*map(torch.from_numpy, (q, k, v))).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_linear_attention_masks():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(2, 6, 2, 4)).astype(np.float32)
    k = rng.normal(size=(2, 8, 2, 4)).astype(np.float32)
    v = rng.normal(size=(2, 8, 2, 4)).astype(np.float32)
    qm = (rng.random((2, 6)) > 0.3).astype(np.float32)
    km = (rng.random((2, 8)) > 0.3).astype(np.float32)
    ours = np.asarray(linear_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(qm), jnp.asarray(km)))
    ref = torch_linear_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
        torch.from_numpy(qm), torch.from_numpy(km)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_full_attention_matches_softmax_oracle():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(1, 5, 2, 4)).astype(np.float32)
    k = rng.normal(size=(1, 7, 2, 4)).astype(np.float32)
    v = rng.normal(size=(1, 7, 2, 4)).astype(np.float32)
    ours = np.asarray(full_attention(*map(jnp.asarray, (q, k, v))))
    tq, tk, tv = map(torch.from_numpy, (q, k, v))
    logits = torch.einsum("blhd,bshd->blsh", tq, tk) / np.sqrt(4)
    attn = torch.softmax(logits, dim=2)
    ref = torch.einsum("blsh,bshd->blhd", attn, tv).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_full_attention_kv_mask_equals_subset_attention():
    """Masked-KV attention must equal attention over the compacted subset —
    the equivalence the GAM self-layers rely on."""
    rng = np.random.default_rng(3)
    q = rng.normal(size=(1, 6, 2, 4)).astype(np.float32)
    k = rng.normal(size=(1, 10, 2, 4)).astype(np.float32)
    v = rng.normal(size=(1, 10, 2, 4)).astype(np.float32)
    keep = np.zeros(10, bool)
    keep[[1, 4, 5, 9]] = True
    masked = np.asarray(full_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        kv_mask=jnp.asarray(keep[None]), mask_fill=-1e8))
    subset = np.asarray(full_attention(
        jnp.asarray(q), jnp.asarray(k[:, keep]), jnp.asarray(v[:, keep])))
    np.testing.assert_allclose(masked, subset, rtol=1e-4, atol=1e-5)


def test_full_attention_zero_empty_rows():
    q = jnp.ones((2, 3, 2, 4))
    k = jnp.ones((2, 5, 2, 4))
    v = jnp.ones((2, 5, 2, 4))
    kv_mask = jnp.array([[True, True, False, False, False],
                         [False, False, False, False, False]])
    out = full_attention(q, k, v, kv_mask=kv_mask, zero_empty_rows=True)
    assert float(jnp.abs(out[1]).max()) == 0.0
    assert float(jnp.abs(out[0]).max()) > 0.0


def test_window_cross_attention_equals_per_query_full():
    rng = np.random.default_rng(4)
    b, l, w, h, d = 1, 4, 6, 2, 4
    q = rng.normal(size=(b, l, h, d)).astype(np.float32)
    k = rng.normal(size=(b, l, w, h, d)).astype(np.float32)
    v = rng.normal(size=(b, l, w, h, d)).astype(np.float32)
    mask = np.ones((b, l, w), bool)
    mask[0, 2, 3:] = False
    mask[0, 3, :] = False  # fully invalid -> zero output
    out = np.asarray(window_cross_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)))
    for i in range(l):
        if not mask[0, i].any():
            np.testing.assert_allclose(out[0, i], 0.0)
            continue
        ref = np.asarray(full_attention(
            jnp.asarray(q[:, i:i + 1]), jnp.asarray(k[0, i][None]),
            jnp.asarray(v[0, i][None]), kv_mask=jnp.asarray(mask[0, i][None]),
            mask_fill=-1e8))
        np.testing.assert_allclose(out[0, i], ref[0, 0], rtol=1e-4, atol=1e-5)


def test_dual_softmax_oracle():
    rng = np.random.default_rng(5)
    f0 = rng.normal(size=(2, 6, 16)).astype(np.float32)
    f1 = rng.normal(size=(2, 8, 16)).astype(np.float32)
    ours = np.asarray(dual_softmax(jnp.asarray(f0), jnp.asarray(f1), 0.1))
    t0, t1 = torch.from_numpy(f0) / 4.0, torch.from_numpy(f1) / 4.0  # /sqrt(16)
    sim = torch.einsum("blc,bsc->bls", t0, t1) / 0.1
    ref = (torch.softmax(sim, 1) * torch.softmax(sim, 2)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_dual_softmax_mask_excludes_padding():
    rng = np.random.default_rng(6)
    f0 = rng.normal(size=(1, 6, 8)).astype(np.float32)
    f1 = rng.normal(size=(1, 6, 8)).astype(np.float32)
    m0 = jnp.array([[1, 1, 1, 1, 0, 0]], jnp.float32)
    m1 = jnp.array([[1, 1, 1, 0, 0, 0]], jnp.float32)
    conf = dual_softmax(jnp.asarray(f0), jnp.asarray(f1), 0.1, m0, m1)
    # valid-row x padded-col cells carry ~zero confidence; fully-masked
    # row x col intersections degrade to the uniform 1/(L*S) plateau — the
    # same behaviour as the reference's -INF fill + dual softmax.
    assert float(conf[0, :4, 3:].max()) < 1e-6
    assert float(conf[0, 4:, :3].max()) < 1e-6
    assert abs(float(conf[0, 5, 5]) - 1.0 / 36.0) < 1e-4


def test_mutual_nearest_mask():
    conf = jnp.asarray(np.array([[[0.9, 0.1], [0.8, 0.05]]], np.float32))
    m = mutual_nearest_mask(conf, thr=0.2)
    # (0,0) is row-0 max and column-0 max; (1,0) is row max but not column max
    assert bool(m[0, 0, 0]) and not bool(m[0, 1, 0]) and not bool(m[0, 0, 1])


def test_linear_attention_flat_matches_split():
    """linear_attention_flat on [B,L,C] must equal linear_attention on the
    head-split layout (same elu+1 map, same /v_length guard), with and
    without masks."""
    from geoformer_tpu.ops.attention import (
        linear_attention,
        linear_attention_flat,
    )

    rng = np.random.default_rng(21)
    b, l, s, h, d = 2, 12, 10, 4, 8
    c = h * d
    qf = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32))
    kf = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))
    qm = jnp.asarray(rng.random((b, l)) > 0.3)
    km = jnp.asarray(rng.random((b, s)) > 0.3)
    for masks in [(None, None), (qm, km)]:
        ref = linear_attention(qf.reshape(b, l, h, d), kf.reshape(b, s, h, d),
                               vf.reshape(b, s, h, d), *masks)
        got = linear_attention_flat(qf, kf, vf, h, *masks)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(ref).reshape(b, l, c),
                                   rtol=2e-5, atol=2e-6)


def test_encoder_layer_linear_flat_matches_linear():
    """EncoderLayer(attention='linear_flat') must reproduce the 'linear'
    output exactly at fine-stack shapes (same params)."""
    import jax

    from geoformer_tpu.models.transformer import EncoderLayer

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((3, 25, 128)).astype(np.float32))
    src = jnp.asarray(rng.random((3, 25, 128)).astype(np.float32))
    lin = EncoderLayer(128, 8, attention="linear")
    flat = EncoderLayer(128, 8, attention="linear_flat")
    params = lin.init(jax.random.key(0), x, src)
    a = lin.apply(params, x, src)
    b = flat.apply(params, x, src)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)
