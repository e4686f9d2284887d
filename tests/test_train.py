"""Training stack: supervision labels, loss, one sharded train step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow  # heavy: full loops / 8-device compiles / torch cross-tests

from geoformer_tpu.config import (
    GeoFormerConfig,
    GeoModuleConfig,
    LossConfig,
    MatchConfig,
    TrainConfig,
)
from geoformer_tpu.geometry.homography import warp_points
from geoformer_tpu.models.coarse_matching import CoarseMatches
from geoformer_tpu.train.loss import coarse_loss, fine_loss, geo_loss
from geoformer_tpu.train.supervision import (
    spvs_coarse_homography,
    spvs_fine_homography,
)


def test_spvs_coarse_identity_homography():
    H = jnp.eye(3)[None]
    conf_gt = spvs_coarse_homography(H, H, (64, 80), 8)
    l = 8 * 10
    gt = np.asarray(conf_gt[0])
    # identity warp -> diagonal matches, except the guarded cell 0
    assert gt.shape == (l, l)
    diag = np.diag(gt)
    assert diag[0] == 0.0
    assert (diag[1:] == 1.0).all()
    assert gt.sum() == l - 1


def test_spvs_coarse_translation():
    # shift by exactly 2 coarse cells in x (16 px)
    H = jnp.asarray(
        np.array([[[1, 0, 16], [0, 1, 0], [0, 0, 1]]], np.float32))
    Hinv = jnp.linalg.inv(H)
    conf_gt = np.asarray(spvs_coarse_homography(H, Hinv, (64, 80), 8)[0])
    w = 10
    rows, cols = np.where(conf_gt)
    for i, j in zip(rows, cols):
        assert j == i + 2, (i, j)          # same row, +2 cells in x
        assert (i % w) + 2 == (j % w)
    # cells whose target is out of bounds have no match
    assert conf_gt.sum() > 0


def test_spvs_coarse_respects_masks():
    H = jnp.eye(3)[None]
    mask0 = jnp.zeros((1, 8, 10)).at[:, :4].set(1.0)
    conf_gt = np.asarray(
        spvs_coarse_homography(H, H, (64, 80), 8, mask0=mask0)[0])
    rows, _ = np.where(conf_gt)
    assert (rows < 40).all()               # only unmasked rows supervised


def test_spvs_fine_identity():
    matches = CoarseMatches(
        conf=jnp.zeros((1, 80, 80)),
        i_ids=jnp.asarray([[11, 12]]),
        j_ids=jnp.asarray([[11, 12]]),
        valid=jnp.asarray([[True, True]]),
        mconf=jnp.asarray([[0.9, 0.9]]),
    )
    H = jnp.eye(3)[None]
    label = np.asarray(spvs_fine_homography(matches, H, 10, 10)[0])
    assert label.shape == (2, 25, 25)
    # identity: each window matches its center cell... but d=0 exactly is
    # excluded by the reference's (d > 0) guard, so the label must be empty.
    assert label.sum() == 0


def test_spvs_fine_small_offset():
    matches = CoarseMatches(
        conf=jnp.zeros((1, 80, 80)),
        i_ids=jnp.asarray([[11]]),
        j_ids=jnp.asarray([[11]]),
        valid=jnp.asarray([[True]]),
        mconf=jnp.asarray([[0.9]]),
    )
    # 1px translation: nearest fine cell at 1px distance -> labeled positive
    H = jnp.asarray(np.array([[[1, 0, 1], [0, 1, 0], [0, 0, 1]]], np.float32))
    label = np.asarray(spvs_fine_homography(matches, H, 10, 10)[0])
    assert label.sum() == 1.0


def test_coarse_loss_focal_decreases_with_confidence():
    cfg = LossConfig()
    gt = jnp.zeros((1, 4, 4)).at[0, 1, 1].set(1.0)
    lo = coarse_loss(jnp.full((1, 4, 4), 0.1), gt, cfg)
    hi = coarse_loss(jnp.full((1, 4, 4), 0.9), gt, cfg)
    assert float(hi) < float(lo)


def test_fine_loss_ignores_invalid_slots():
    cfg = LossConfig()
    conf = jnp.full((1, 2, 4, 4), 0.5)
    label = jnp.zeros((1, 2, 4, 4)).at[0, 0, 1, 1].set(1.0)
    both = fine_loss(conf, label, jnp.asarray([[True, True]]), cfg)
    only0 = fine_loss(conf, label, jnp.asarray([[True, False]]), cfg)
    # masking slot 1 removes its negatives only; positives identical
    assert np.isfinite(float(both)) and np.isfinite(float(only0))
    none = fine_loss(conf, label, jnp.asarray([[False, False]]), cfg)
    assert float(none) == 0.0


def test_single_train_step_runs_and_is_finite():
    from geoformer_tpu.data.synthetic import make_pair_batch
    from geoformer_tpu.train.trainer import init_state, make_train_step

    hw = (64, 80)
    cfg = GeoFormerConfig(
        match=MatchConfig(max_matches=32, force_one_match=True),
        geo=GeoModuleConfig(ransac_iters=32, max_inliers=32),
    )
    tcfg = TrainConfig(batch_size=2, image_hw=hw, steps_per_epoch=10)
    model_ = __import__("geoformer_tpu.models", fromlist=["GeoFormer"])
    model = model_.GeoFormer(cfg)
    state, opt = init_state(model, tcfg, jax.random.key(0))
    step = make_train_step(model, opt, tcfg)

    base = jnp.asarray(np.random.default_rng(0).random((2, *hw), np.float32))
    batch = make_pair_batch(base, jax.random.key(1))
    jstep = jax.jit(step)
    lr = jnp.asarray(1e-4)
    state2, metrics = jstep(state, batch, jax.random.key(2), lr)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    # With tiny LRs the f32 weights may not change representably; assert on
    # the optimizer moments instead: gradients flowed and were accumulated.
    state3, metrics3 = jstep(state2, batch, jax.random.key(3), lr)
    assert int(state3.step) == 2
    assert np.isfinite(float(metrics3["loss"]))
    mu_norm = optax.global_norm(state3.opt_state)
    assert np.isfinite(float(mu_norm)) and float(mu_norm) > 0.0


def test_multidevice_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(min(4, len(jax.devices())))


def test_depth_train_step_runs():
    from geoformer_tpu.train.trainer import init_state, make_depth_train_step

    hw = (64, 80)
    cfg = GeoFormerConfig(
        match=MatchConfig(max_matches=32, force_one_match=True),
        geo=GeoModuleConfig(ransac_iters=32, max_inliers=32),
    )
    tcfg = TrainConfig(batch_size=2, image_hw=hw, steps_per_epoch=10)
    from geoformer_tpu.models import GeoFormer

    model = GeoFormer(cfg)
    state, opt = init_state(model, tcfg, jax.random.key(0))
    step = make_depth_train_step(model, opt, tcfg)

    rng = np.random.default_rng(0)
    b = 2
    K = np.array([[100.0, 0, 40], [0, 100, 32], [0, 0, 1]], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.5
    batch = {
        "image0": jnp.asarray(rng.random((b, *hw, 1), np.float32)),
        "image1": jnp.asarray(rng.random((b, *hw, 1), np.float32)),
        "depth0": jnp.full((b, *hw), 5.0),
        "depth1": jnp.full((b, *hw), 5.0),
        "T_0to1": jnp.asarray(np.tile(T, (b, 1, 1))),
        "T_1to0": jnp.asarray(np.tile(np.linalg.inv(T), (b, 1, 1))),
        "K0": jnp.asarray(np.tile(K, (b, 1, 1))),
        "K1": jnp.asarray(np.tile(K, (b, 1, 1))),
        "scale0": jnp.ones((b, 2)),
        "scale1": jnp.ones((b, 2)),
    }
    state2, metrics = jax.jit(step)(state, batch, jax.random.key(1), jnp.asarray(1e-4))
    assert np.isfinite(float(metrics["loss"])), metrics
    assert int(state2.step) == 1


def test_legacy_fine_supervision_and_loss():
    from geoformer_tpu.train.loss import fine_loss_l2_std
    from geoformer_tpu.train.supervision import spvs_fine_expec_homography

    matches = CoarseMatches(
        conf=jnp.zeros((1, 80, 80)),
        i_ids=jnp.asarray([[11, 12]]),
        j_ids=jnp.asarray([[11, 12]]),
        valid=jnp.asarray([[True, True]]),
        mconf=jnp.asarray([[0.9, 0.9]]),
    )
    # 2px x-translation -> normalized offset 2 / (2*2) = 0.5
    H = jnp.asarray(np.array([[[1, 0, 2], [0, 1, 0], [0, 0, 1]]], np.float32))
    gt = spvs_fine_expec_homography(matches, H, 10, 10)
    np.testing.assert_allclose(np.asarray(gt[0, 0]), [0.5, 0.0], atol=1e-6)

    # perfect prediction -> ~zero loss; wrong prediction -> bigger
    pred_good = jnp.concatenate([gt, jnp.full((1, 2, 1), 1.0)], -1)
    pred_bad = jnp.concatenate([-gt, jnp.full((1, 2, 1), 1.0)], -1)
    valid = matches.valid
    lg = float(fine_loss_l2_std(pred_good, gt, valid))
    lb = float(fine_loss_l2_std(pred_bad, gt, valid))
    assert lg < 1e-10 and lb > lg


def test_pair_batch_supervision_consistency():
    """Property: for generated pairs, every positive coarse GT cell (i, j)
    must satisfy warp(center_i, H_0to1) ~ center_j (within one cell)."""
    from geoformer_tpu.data.synthetic import make_pair_batch
    from geoformer_tpu.geometry.homography import warp_points
    from geoformer_tpu.models.coarse_matching import match_coords

    hw = (64, 80)
    base = jnp.asarray(np.random.default_rng(0).random((2, *hw), np.float32))
    batch = make_pair_batch(base, jax.random.key(5))
    conf_gt = spvs_coarse_homography(
        batch["H_0to1"], batch["H_1to0"], hw, 8,
        batch["mask0"], batch["mask1"])
    wc = hw[1] // 8
    for b in range(2):
        rows, cols = np.where(np.asarray(conf_gt[b]))
        if len(rows) == 0:
            continue
        c0 = match_coords(jnp.asarray(rows), wc, 8)
        c1 = match_coords(jnp.asarray(cols), wc, 8)
        w0 = warp_points(c0, batch["H_0to1"][b])
        d = np.linalg.norm(np.asarray(w0) - np.asarray(c1), axis=1)
        assert d.max() < 8.0, d.max()   # within one coarse cell
        # and a healthy number of supervised cells exists
        assert len(rows) > 5
