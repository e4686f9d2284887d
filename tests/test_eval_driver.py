"""Eval harness integration: mini-HPatches dataset -> driver -> metrics."""

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: full loops / 8-device compiles / torch cross-tests

from geoformer_tpu.config import GeoFormerConfig, GeoModuleConfig, MatchConfig
from geoformer_tpu.eval.hpatches import eval_hpatches, fit_homography_np
from geoformer_tpu.eval.matcher import BatchedMatcher, resize_shape
from geoformer_tpu.models import GeoFormer


@pytest.fixture(scope="module")
def tiny_model():
    cfg = GeoFormerConfig(
        match=MatchConfig(thr=0.01, max_matches=64),
        geo=GeoModuleConfig(ransac_iters=32, max_inliers=64),
    )
    model = GeoFormer(cfg)
    key = jax.random.key(0)
    img = jnp.zeros((1, 64, 64, 1))
    params = model.init({"params": key, "ransac": key}, img, img)
    return cfg, params


def _make_hpatches_dir(tmp_path, n_seqs=2, hw=(96, 128)):
    rng = np.random.default_rng(0)
    h, w = hw
    for s in range(n_seqs):
        name = ("i" if s % 2 == 0 else "v") + f"_seq{s}"
        d = tmp_path / name
        d.mkdir()
        base = (rng.random((h, w)) * 255).astype(np.uint8)
        # OpenCV's .ppm writer requires 3-channel BGR (real HPatches ppm are
        # color as well)
        cv2.imwrite(str(d / "1.ppm"), cv2.cvtColor(base, cv2.COLOR_GRAY2BGR))
        for idx in range(2, 7):
            H = np.array([[1, 0, (idx - 1) * 2.0], [0, 1, 0], [0, 0, 1]])
            warped = cv2.warpPerspective(base, H, (w, h))
            cv2.imwrite(str(d / f"{idx}.ppm"),
                        cv2.cvtColor(warped, cv2.COLOR_GRAY2BGR))
            np.savetxt(str(d / f"H_1_{idx}"), H)
    return tmp_path


def test_resize_shape_semantics():
    # min edge above imsize -> scaled; below -> only /8 floor
    wt, ht, sc = resize_shape(1280, 960, 480)
    assert min(wt, ht) == 480 and wt % 8 == 0 and ht % 8 == 0
    wt2, ht2, _ = resize_shape(320, 240, 480)
    assert (wt2, ht2) == (320, 240)


def test_batched_matcher_shapes(tiny_model):
    cfg, params = tiny_model
    rng = np.random.default_rng(1)
    imgs = [rng.random((96, 128)).astype(np.float32) for _ in range(3)]
    matcher = BatchedMatcher(cfg, params, batch_size=2)
    out = matcher.match_batch(imgs, imgs)
    assert len(out) == 3
    for mk0, mk1, conf in out:
        assert mk0.shape == mk1.shape and mk0.shape[1] == 2
        assert conf.shape[0] == mk0.shape[0]


def test_eval_hpatches_driver_runs(tiny_model, tmp_path):
    cfg, params = tiny_model
    data_root = _make_hpatches_dir(tmp_path)
    out = eval_hpatches(params, cfg, str(data_root), imsize=96, batch_size=2,
                        log=lambda *_: None)
    assert out["n_pairs"] == 10
    # untrained model: fits may fail, but every pair must be accounted for
    assert "auc_a" in out or out["est_failed"] == 10
    if "auc_a" in out:
        assert len(out["auc_a"]) == 4


def test_fit_homography_np_roundtrip():
    rng = np.random.default_rng(2)
    H = np.array([[1.02, 0.01, 5.0], [-0.02, 0.98, -3.0], [1e-5, 0, 1]])
    p0 = rng.uniform(0, 400, (100, 2)).astype(np.float32)
    ph = np.concatenate([p0, np.ones((100, 1))], 1) @ H.T
    p1 = (ph[:, :2] / ph[:, 2:]).astype(np.float32)
    Hp, inl = fit_homography_np(p0, p1, thr=3.0)
    assert Hp is not None
    assert inl.mean() > 0.95
    np.testing.assert_allclose(Hp / Hp[2, 2], H / H[2, 2], atol=1e-2)


def test_batched_matcher_mixed_aspect_bucket(tiny_model):
    """Regression: the padded bucket must cover BOTH the tallest and widest
    image (elementwise max, not lexicographic tuple max)."""
    cfg, params = tiny_model
    rng = np.random.default_rng(3)
    tall = rng.random((128, 64)).astype(np.float32)   # taller
    wide = rng.random((96, 160)).astype(np.float32)   # wider
    matcher = BatchedMatcher(cfg, params, batch_size=2)
    out = matcher.match_batch([tall, wide], [wide, tall])
    assert len(out) == 2  # would raise on a too-small bucket before the fix


def _write_jpg(path, arr):
    cv2.imwrite(str(path), cv2.cvtColor(arr, cv2.COLOR_GRAY2BGR))


def test_eval_fire_driver_runs(tiny_model, tmp_path):
    from geoformer_tpu.eval.fire import eval_fire

    cfg, params = tiny_model
    rng = np.random.default_rng(4)
    (tmp_path / "images").mkdir()
    (tmp_path / "ground_truth").mkdir()
    h, w = 96, 96
    for pair in ("S01", "P02", "A03"):
        base = (rng.random((h, w)) * 255).astype(np.uint8)
        H = np.array([[1, 0, 3.0], [0, 1, -2.0], [0, 0, 1]])
        warped = cv2.warpPerspective(base, H, (w, h))
        _write_jpg(tmp_path / "images" / f"{pair}_1.jpg", base)
        _write_jpg(tmp_path / "images" / f"{pair}_2.jpg", warped)
        pts = rng.uniform(10, 80, (10, 2))
        ph = np.concatenate([pts, np.ones((10, 1))], 1) @ H.T
        gt = np.concatenate([pts, ph[:, :2] / ph[:, 2:]], 1)
        np.savetxt(str(tmp_path / "ground_truth" /
                       f"control_points_{pair}_1_2.txt"), gt)

    out = eval_fire(params, cfg, str(tmp_path), imsize=96, batch_size=1,
                    log=lambda *_: None)
    assert out["n_pairs"] == 3
    assert set(out["auc_per_class"]) <= {"S", "P", "A"}
    assert 0.0 <= out["mAUC"] <= 1.0


def test_eval_isc_driver_runs(tiny_model, tmp_path):
    from geoformer_tpu.eval.isc import eval_isc

    cfg, params = tiny_model
    rng = np.random.default_rng(5)
    for d in ("query", "refer", "gd"):
        (tmp_path / d).mkdir()
    h, w = 96, 96
    for name in ("10", "11"):
        base = (rng.random((h, w)) * 255).astype(np.uint8)
        H = np.array([[1, 0, -2.0], [0, 1, 3.0], [0, 0, 1]])
        warped = cv2.warpPerspective(base, H, (w, h))
        _write_jpg(tmp_path / "query" / f"{name}_2.jpg", warped)
        _write_jpg(tmp_path / "refer" / f"{name}_1.jpg", base)
        # normalized control points: query(x,y) -> refer(x,y)
        pts_r = rng.uniform(10, 80, (8, 2))
        ph = np.concatenate([pts_r, np.ones((8, 1))], 1) @ H.T
        pts_q = ph[:, :2] / ph[:, 2:]
        gd = np.concatenate([pts_q / [w, h], pts_r / [w, h]], 1)
        np.savetxt(str(tmp_path / "gd" / f"{name}_2-{name}_1.txt"), gd)

    out = eval_isc(params, cfg, str(tmp_path), imsize=96, batch_size=1,
                   log=lambda *_: None)
    assert out["n_pairs"] == 2
    assert len(out["auc"]) == 3


def test_batched_matcher_mesh_matches_single_device(tiny_model):
    """Data-parallel eval: a mesh-sharded matcher returns the same matches
    as the single-device path (params replicated, batch over P('data'))."""
    from jax.sharding import Mesh

    cfg, params = tiny_model
    rng = np.random.default_rng(3)
    imgs0 = [rng.random((96, 128)).astype(np.float32) for _ in range(4)]
    imgs1 = [np.roll(im, 2, axis=1) for im in imgs0]

    plain = BatchedMatcher(cfg, params, batch_size=4)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    sharded = BatchedMatcher(cfg, params, batch_size=4, mesh=mesh)

    out_p = plain.match_batch(imgs0, imgs1)
    out_s = sharded.match_batch(imgs0, imgs1)
    assert len(out_p) == len(out_s) == 4
    for (a0, a1, ac), (b0, b1, bc) in zip(out_p, out_s):
        np.testing.assert_allclose(a0, b0, atol=1e-4)
        np.testing.assert_allclose(a1, b1, atol=1e-4)
        np.testing.assert_allclose(ac, bc, atol=1e-4)


def test_batched_matcher_seq_mesh_matches_single_device(tiny_model):
    """Sequence-parallel eval: a seq_mesh matcher (one pair's tokens sharded
    over all 8 devices) returns the same matches as the replicated path."""
    from jax.sharding import Mesh

    from geoformer_tpu.config import FineMatchConfig

    cfg, params = tiny_model
    # zero fine threshold: a random-init model's fine confidences are flat
    # (max ~0.007), so the default 0.1 gate would empty both paths and make
    # the overlap statistic vacuous
    cfg = cfg.replace(fine_match=FineMatchConfig(thr=0.0))
    rng = np.random.default_rng(4)
    # self-matching: confident diagonal coarse matches even at random init
    img0 = rng.random((96, 128)).astype(np.float32)
    img1 = img0.copy()

    plain = BatchedMatcher(cfg, params, batch_size=1)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("seq",))
    sp = BatchedMatcher(cfg, params, batch_size=1, seq_mesh=mesh)

    (a0, a1, ac), = plain.match_batch([img0], [img1])
    (b0, b1, bc), = sp.match_batch([img0], [img1])
    # identical match decisions modulo float-tie jitter: compare the common
    # coordinate sets, requiring near-total overlap
    sa = {tuple(p) for p in np.round(a0, 2).tolist()}
    sb = {tuple(p) for p in np.round(b0, 2).tolist()}
    assert sa | sb, "no matches on either path — test is vacuous"
    assert len(sa & sb) / len(sa | sb) >= 0.9, \
        (len(sa), len(sb), len(sa & sb))
