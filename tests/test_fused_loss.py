"""Streaming coarse loss (ops/fused_loss.py) vs the dense reference path.

The streaming loss must match train.loss.coarse_loss(dual_softmax(...)) in
value AND gradient for every branch (sparse focal / dense focal / CE), with
and without padding masks, including the chunk-padding path (L not divisible
by the chunk size).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoformer_tpu.config import LossConfig
from geoformer_tpu.ops.fused_loss import sim_lse, streaming_coarse_loss
from geoformer_tpu.ops.matching import dual_softmax
from geoformer_tpu.train.loss import coarse_loss
from geoformer_tpu.train.supervision import (
    _coarse_gt_from_warps,
    sparse_coarse_gt_from_warps,
    spvs_coarse_homography,
    spvs_coarse_homography_sparse,
)


def _rand_problem(key, b=2, l=37, s=29, c=16, with_masks=False):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    f0 = jax.random.normal(k1, (b, l, c))
    f1 = jax.random.normal(k2, (b, s, c))
    gt_j = jax.random.randint(k3, (b, l), 0, s)
    gt_valid = jax.random.bernoulli(k4, 0.3, (b, l))
    if with_masks:
        mask0 = jax.random.bernoulli(k5, 0.8, (b, l)).astype(jnp.float32)
        mask1 = jax.random.bernoulli(
            jax.random.fold_in(k5, 1), 0.8, (b, s)).astype(jnp.float32)
    else:
        mask0 = mask1 = None
    return f0, f1, gt_j, gt_valid, mask0, mask1


def _dense_loss(f0, f1, gt_j, gt_valid, cfg, temp, mask0, mask1):
    b, l, _ = f0.shape
    s = f1.shape[1]
    conf = dual_softmax(f0, f1, temp, mask0, mask1)
    cols = jnp.where(gt_valid, gt_j, s)
    conf_gt = jnp.zeros((b, l, s + 1))
    conf_gt = conf_gt.at[jnp.arange(b)[:, None], jnp.arange(l)[None],
                         cols].set(1.0)[:, :, :s]
    weight = None
    if mask0 is not None:
        weight = mask0[:, :, None] * mask1[:, None, :]
    return coarse_loss(conf, conf_gt, cfg, weight)


def test_sim_lse_matches_dense():
    key = jax.random.PRNGKey(0)
    f0, f1, _, _, mask0, mask1 = _rand_problem(key, with_masks=True)
    temp = 0.1
    c = f0.shape[-1]
    sim = jnp.einsum("blc,bsc->bls", f0, f1) / (c * temp)
    valid = (mask0[:, :, None] > 0) & (mask1[:, None, :] > 0)
    sim = jnp.where(valid, sim, -1e9)
    r, cvec = sim_lse(f0, f1, temp, mask0, mask1, chunk=8)
    np.testing.assert_allclose(r, jax.nn.logsumexp(sim, axis=2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(cvec, jax.nn.logsumexp(sim, axis=1),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("coarse_type,sparse", [
    ("focal", True), ("focal", False), ("cross_entropy", False),
])
@pytest.mark.parametrize("with_masks", [False, True])
def test_streaming_matches_dense_value_and_grad(coarse_type, sparse,
                                                with_masks):
    cfg = LossConfig(coarse_type=coarse_type, sparse_spvs=sparse)
    key = jax.random.PRNGKey(hash((coarse_type, sparse, with_masks)) % 2**31)
    f0, f1, gt_j, gt_valid, mask0, mask1 = _rand_problem(
        key, with_masks=with_masks)
    temp = 0.1

    dense = jax.value_and_grad(
        lambda a, b2: _dense_loss(a, b2, gt_j, gt_valid, cfg, temp,
                                  mask0, mask1), argnums=(0, 1))
    stream = jax.value_and_grad(
        lambda a, b2: streaming_coarse_loss(a, b2, gt_j, gt_valid, cfg, temp,
                                            mask0, mask1, chunk=8),
        argnums=(0, 1))
    vd, (g0d, g1d) = dense(f0, f1)
    vs, (g0s, g1s) = stream(f0, f1)
    np.testing.assert_allclose(vs, vd, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(g0s, g0d, rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(g1s, g1d, rtol=5e-4, atol=1e-6)


def test_streaming_chunk_invariance():
    cfg = LossConfig()
    f0, f1, gt_j, gt_valid, _, _ = _rand_problem(jax.random.PRNGKey(3))
    a = streaming_coarse_loss(f0, f1, gt_j, gt_valid, cfg, chunk=37)
    b = streaming_coarse_loss(f0, f1, gt_j, gt_valid, cfg, chunk=5)
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_sparse_supervision_matches_dense():
    key = jax.random.PRNGKey(7)
    b, hw = 2, (64, 80)
    ang = jax.random.uniform(key, (b,), minval=-0.05, maxval=0.05)
    H = jnp.stack([jnp.stack([jnp.cos(ang), -jnp.sin(ang),
                              jnp.full_like(ang, 3.0)], -1),
                   jnp.stack([jnp.sin(ang), jnp.cos(ang),
                              jnp.full_like(ang, -2.0)], -1),
                   jnp.stack([jnp.zeros_like(ang), jnp.zeros_like(ang),
                              jnp.ones_like(ang)], -1)], axis=1)
    Hinv = jnp.linalg.inv(H)
    dense = spvs_coarse_homography(H, Hinv, hw, 8)
    gt_j, gt_valid = spvs_coarse_homography_sparse(H, Hinv, hw, 8)
    l1 = dense.shape[2]
    cols = jnp.where(gt_valid, gt_j, l1)
    rebuilt = jnp.zeros((b, dense.shape[1], l1 + 1))
    rebuilt = rebuilt.at[jnp.arange(b)[:, None],
                         jnp.arange(dense.shape[1])[None],
                         cols].set(1.0)[:, :, :l1]
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(rebuilt))
    assert bool(gt_valid.any())  # the synthetic warp must produce matches
