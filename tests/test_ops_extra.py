"""Sinkhorn OT, NMS, image warp, resize ops."""

import jax
import jax.numpy as jnp
import numpy as np

from geoformer_tpu.ops.image_warp import warp_image
from geoformer_tpu.ops.nms import simple_nms, top_k_keypoints
from geoformer_tpu.ops.resize import resize_bilinear_align_corners
from geoformer_tpu.ops.sinkhorn import log_optimal_transport


def test_sinkhorn_marginals():
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(1, 6, 8)).astype(np.float32))
    Z = log_optimal_transport(scores, jnp.asarray(1.0), iters=50)
    P = np.exp(np.asarray(Z)) / (6 + 8)
    # marginals: every real row/column (dustbin included in the sum) carries
    # exactly 1/(M+N) mass, and the full coupling sums to 1
    np.testing.assert_allclose(P[0, :6].sum(-1), np.full(6, 1 / 14.0),
                               atol=1e-3)
    np.testing.assert_allclose(P[0, :, :8].sum(0), np.full(8, 1 / 14.0),
                               atol=1e-3)
    assert np.isclose(P.sum(), 1.0, atol=1e-3)


def test_simple_nms_keeps_isolated_peaks():
    s = np.zeros((16, 16), np.float32)
    s[4, 4] = 1.0
    s[12, 12] = 0.8
    s[4, 5] = 0.5  # suppressed by neighbor peak
    out = np.asarray(simple_nms(jnp.asarray(s), radius=2))
    assert out[4, 4] == 1.0 and out[12, 12] == 0.8
    assert out[4, 5] == 0.0


def test_top_k_keypoints():
    s = np.zeros((8, 10), np.float32)
    s[2, 3] = 0.9
    s[5, 7] = 0.8
    xy, vals = top_k_keypoints(jnp.asarray(s), 2)
    assert np.asarray(xy).tolist() == [[3, 2], [7, 5]]


def test_warp_image_identity():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((1, 16, 20, 1)).astype(np.float32))
    out = warp_image(img, jnp.eye(3)[None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_warp_image_translation_matches_cv2():
    import cv2

    rng = np.random.default_rng(2)
    im = rng.random((32, 40)).astype(np.float32)
    H = np.array([[1, 0, 3.5], [0, 1, -2.25], [0, 0, 1]], np.float32)
    ours = np.asarray(warp_image(jnp.asarray(im[None, :, :, None]),
                                 jnp.asarray(H[None])))[0, :, :, 0]
    ref = cv2.warpPerspective(im, H, (40, 32))
    # interiors match; borders differ by cv2's edge handling
    np.testing.assert_allclose(ours[4:-4, 6:-6], ref[4:-4, 6:-6], atol=1e-4)


def test_resize_align_corners_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    x = rng.random((1, 7, 9, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (14, 18)))
    ref = F.interpolate(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                        size=(14, 18), mode="bilinear", align_corners=True)
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
