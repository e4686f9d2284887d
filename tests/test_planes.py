"""Rendered plane-scene corpus: geometric self-consistency.

The depth-supervised trainer's ground truth flows through
geometry/depth.warp_kpts_depth (reference: loftr utils/geometry.py:5-54),
so the rendered corpus (data/planes.py + scripts/render_depth_corpus.py)
must satisfy exactly that warp: a pixel with rendered depth in camera A,
unprojected and reprojected into camera B, must land on the same world
plane point (photometrically, the same texture content).
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from geoformer_tpu.data.planes import look_at, render_planes, room_scene
from geoformer_tpu.geometry.depth import warp_kpts_depth

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    tex = np.stack([rng.random((96, 128)).astype(np.float32)
                    for _ in range(5)])
    # smooth the textures so bilinear warp comparisons are meaningful
    tex = np.stack([cv2.GaussianBlur(t, (0, 0), 2.0) for t in tex])
    planes = room_scene(rng, tex)
    K = np.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]])
    T0 = look_at(np.array([-0.5, 0.0, 0.2]), np.array([0.0, 0, 8.0]))
    T1 = look_at(np.array([0.6, 0.1, 0.4]), np.array([0.2, 0, 8.0]))
    img0, depth0 = render_planes(K, T0, planes, (120, 160),
                                 return_depth=True)
    img1, depth1 = render_planes(K, T1, planes, (120, 160),
                                 return_depth=True)
    return K, T0, T1, img0, depth0, img1, depth1


def test_depth_is_positive_and_bounded(scene):
    _, _, _, _, depth0, _, depth1 = scene
    for d in (depth0, depth1):
        vis = d > 0
        assert vis.mean() > 0.5           # most of the frame sees a plane
        assert d[vis].min() > 0.5 and d[vis].max() < 30.0


def test_warp_kpts_depth_consistency(scene):
    K, T0, T1, img0, depth0, img1, depth1 = scene
    T_0to1 = (T1 @ np.linalg.inv(T0)).astype(np.float32)

    ys, xs = np.mgrid[10:110:8, 10:150:8]
    kpts0 = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
    valid, w_kpts = warp_kpts_depth(
        jnp.asarray(kpts0[None]), jnp.asarray(depth0[None]),
        jnp.asarray(depth1[None]), jnp.asarray(T_0to1[None]),
        jnp.asarray(K[None].astype(np.float32)),
        jnp.asarray(K[None].astype(np.float32)))
    valid = np.asarray(valid[0])
    w_kpts = np.asarray(w_kpts[0])
    assert valid.sum() > 50                # plenty of co-visible points

    # photometric check: the warped locations see the same plane content
    # (bilinear sample both images; nearest-pixel depth sampling and jpeg-
    # free float textures keep the tolerance tight)
    def bil(im, pts):
        m = cv2.remap(im, pts[None, :, 0].astype(np.float32),
                      pts[None, :, 1].astype(np.float32), cv2.INTER_LINEAR)
        return m[0]

    v0 = bil(img0, kpts0[valid])
    v1 = bil(img1, w_kpts[valid])
    err = np.abs(v0 - v1)
    # occlusion-boundary pixels can mismatch; the bulk must agree
    assert np.median(err) < 0.02
    assert (err < 0.1).mean() > 0.85


def test_corpus_reader_roundtrip(tmp_path):
    """render_depth_corpus scene -> unmodified MegaDepth reader -> batch
    fields with consistent shapes and valid GT supervision inputs."""
    from render_depth_corpus import build_scene

    from geoformer_tpu.data.megadepth import MegaDepthScene

    n_pairs = build_scene(str(tmp_path), str(tmp_path / "index"),
                          "s0", seed=3, n_cams=4, hw=(120, 160))
    assert n_pairs == 6
    scene = MegaDepthScene(str(tmp_path / "index" / "s0.npz"),
                           str(tmp_path), img_resize=160, depth_pad=160)
    assert len(scene) == 6
    s = scene.get(0)
    assert s["image0"].shape == (160, 160, 1)
    assert s["depth0"].shape == (160, 160)
    assert np.isfinite(s["T_0to1"]).all()
    # relative pose times its inverse is identity
    np.testing.assert_allclose(s["T_0to1"] @ s["T_1to0"], np.eye(4),
                               atol=1e-5)
    assert (s["depth0"] > 0).mean() > 0.3
