"""Round-2 completeness: ResNetFPN_16_4, mask erosion, pixel shuffle,
mutual matches under H, ratio-preserving resize, ISC ROC/EER, plotting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoformer_tpu.config import BackboneConfig
from geoformer_tpu.geometry.homography import (
    compute_valid_mask,
    erode_mask,
    mutual_matches_under_homography,
    pixel_shuffle,
    pixel_shuffle_inv,
)


def test_resnetfpn_16_4_shapes():
    from geoformer_tpu.models.backbone import build_backbone

    cfg = BackboneConfig(initial_dim=8, block_dims=(8, 12, 16, 24),
                         resolution=(16, 4))
    bb = build_backbone(cfg)
    x = jnp.zeros((1, 64, 96, 1))
    params = bb.init(jax.random.key(0), x)
    c, f = bb.apply(params, x)
    assert c.shape == (1, 4, 6, 24)      # 1/16, block_dims[3]
    assert f.shape == (1, 16, 24, 12)    # 1/4, block_dims[1]


def test_build_backbone_dispatch_and_validation():
    from geoformer_tpu.models.backbone import (
        ResNetFPN,
        ResNetFPN_16_4,
        build_backbone,
    )

    assert isinstance(build_backbone(BackboneConfig()), ResNetFPN)
    assert isinstance(
        build_backbone(BackboneConfig(block_dims=(8, 12, 16, 24),
                                      resolution=(16, 4))),
        ResNetFPN_16_4)
    with pytest.raises(ValueError):
        build_backbone(BackboneConfig(resolution=(4, 1)))


def test_erode_mask_shrinks_border():
    m = jnp.zeros((12, 12)).at[2:10, 2:10].set(1.0)
    e = np.asarray(erode_mask(m, 2))
    assert e.sum() < float(m.sum())
    assert e[5, 5] == 1.0 and e[2, 2] == 0.0
    # radius 0 is the identity
    np.testing.assert_array_equal(np.asarray(erode_mask(m, 0)), np.asarray(m))


def test_valid_mask_erosion_option():
    H = jnp.eye(3)
    full = np.asarray(compute_valid_mask((16, 16), H))
    eroded = np.asarray(compute_valid_mask((16, 16), H, erosion_radius=2))
    assert full.sum() == 16 * 16
    assert eroded.sum() < full.sum()
    assert eroded[8, 8] == 1.0


def test_pixel_shuffle_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).random((2, 4, 6, 8)))
    up = pixel_shuffle(x, 2)
    assert up.shape == (2, 8, 12, 2)
    back = pixel_shuffle_inv(up, 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))
    # depth-to-space semantics: channel block (r*r) tiles a 2x2 pixel patch
    one = jnp.zeros((1, 1, 1, 4)).at[0, 0, 0, 1].set(1.0)
    u = np.asarray(pixel_shuffle(one, 2))[0, :, :, 0]
    assert u[0, 1] == 1.0 and u.sum() == 1.0


def test_mutual_matches_under_homography():
    rng = np.random.default_rng(1)
    k1 = rng.uniform(10, 100, (12, 2)).astype(np.float32)
    H = np.array([[1, 0, 5], [0, 1, -3], [0, 0, 1]], np.float32)
    # kpts2 = warped kpts1, shuffled, plus distractors
    perm = rng.permutation(12)
    k2 = (k1 + np.array([5, -3]))[perm]
    k2 = np.concatenate([k2, rng.uniform(200, 300, (5, 2))]).astype(np.float32)
    idx, ok = mutual_matches_under_homography(
        jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(H), dist_thresh=1.0)
    assert bool(ok.all())
    np.testing.assert_array_equal(np.asarray(idx), np.argsort(perm))


def test_ratio_preserving_resize():
    from geoformer_tpu.eval.matcher import ratio_preserving_resize

    import cv2

    im = (np.random.default_rng(0).random((30, 40)) * 255).astype(np.uint8)
    out = ratio_preserving_resize(im, (60, 60))
    assert out.shape == (60, 60)
    # max-scale covers the target: 30x40 scales by 2 -> 60x80, width is
    # center-cropped to 60 (reference CropAndPad with negative px)
    tmp = cv2.resize(im, (80, 60))
    np.testing.assert_array_equal(out, tmp[:, 10:70])
    # other aspect: height is the cropped axis
    out2 = ratio_preserving_resize(im, (30, 80))
    assert out2.shape == (30, 80)
    tmp2 = cv2.resize(im, (80, 60))
    np.testing.assert_array_equal(out2, tmp2[15:45])


def test_roc_eer_perfect_and_chance():
    from geoformer_tpu.eval.isc import compute_eer, roc_curve_np

    labels = np.array([1, 1, 1, 0, 0, 0])
    perfect = np.array([10, 9, 8, 1, 2, 3])
    eer, thr = compute_eer(labels, perfect)
    assert eer == pytest.approx(0.0, abs=1e-9)
    assert 3 < thr <= 8

    inverted = np.array([1, 2, 3, 10, 9, 8])
    eer_bad, _ = compute_eer(labels, inverted)
    assert eer_bad == pytest.approx(1.0, abs=1e-9)

    fpr, tpr, _ = roc_curve_np(labels, perfect)
    assert fpr[0] == 0.0 and tpr[-1] == 1.0
    assert np.all(np.diff(fpr) >= 0) and np.all(np.diff(tpr) >= 0)


def test_matching_figure_smoke(tmp_path):
    from geoformer_tpu.utils.plotting import (
        compose_pair,
        make_matching_figure,
    )

    img0 = np.random.default_rng(0).random((32, 40)).astype(np.float32)
    img1 = np.random.default_rng(1).random((32, 48)).astype(np.float32)
    canvas, x1 = compose_pair(img0, img1)
    assert canvas.shape == (32, 40 + 10 + 48) and x1 == 50
    mk0 = np.array([[5.0, 5.0], [20.0, 12.0]])
    mk1 = np.array([[7.0, 6.0], [22.0, 11.0]])
    p = str(tmp_path / "fig.png")
    make_matching_figure(img0, img1, mk0, mk1,
                         text=["test", "2 matches"], path=p)
    import os

    assert os.path.getsize(p) > 0


def test_log_val_match_figure_records_to_writer():
    """Validation match-figure logging: renders the first pair's valid
    matches and hands a figure to the SummaryWriter-compatible sink."""
    from types import SimpleNamespace

    from geoformer_tpu.utils.plotting import log_val_match_figure

    class Sink:
        def __init__(self):
            self.calls = []

        def add_figure(self, tag, fig, step):
            self.calls.append((tag, fig, step))

    b, m = 2, 4
    out = SimpleNamespace(fine=SimpleNamespace(
        mkpts0=np.tile(np.array([[4.0, 4.0], [10, 8], [0, 0], [1, 1]]),
                       (b, 1, 1)),
        mkpts1=np.tile(np.array([[5.0, 4.0], [11, 9], [0, 0], [1, 1]]),
                       (b, 1, 1)),
        valid=np.tile(np.array([1, 1, 0, 0], bool), (b, 1)),
    ))
    batch = {
        "image0": np.zeros((b, 16, 20, 1), np.float32),
        "image1": np.ones((b, 16, 20, 1), np.float32),
    }
    tb = Sink()
    log_val_match_figure(tb, out, batch, step=7)
    (tag, fig, step), = tb.calls
    assert tag == "val/matches" and step == 7
    assert fig.get_axes(), "figure should carry the composited axes"


def test_geo_window_figure_smoke(tmp_path):
    """GAM window overlay (cross_draw counterpart): renders for a valid H
    and degrades to an annotation when RANSAC failed."""
    import os

    from geoformer_tpu.utils.plotting import make_geo_window_figure

    rng = np.random.default_rng(2)
    img0 = rng.random((64, 80)).astype(np.float32)
    img1 = rng.random((64, 80)).astype(np.float32)
    H = np.array([[1.0, 0.02, 4.0], [-0.01, 1.0, -3.0], [1e-5, 0, 1.0]])
    p = str(tmp_path / "geo.png")
    make_geo_window_figure(img0, img1, H, has_H=True, scale=8,
                           window_size=5, stride=17, path=p)
    assert os.path.getsize(p) > 0
    p2 = str(tmp_path / "geo_fail.png")
    make_geo_window_figure(img0, img1, np.eye(3), has_H=False, path=p2)
    assert os.path.getsize(p2) > 0
