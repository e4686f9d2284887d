"""Native C++ data generator: build, correctness vs numpy/cv2 oracles."""

import numpy as np
import pytest

from geoformer_tpu.data.native import (
    load_library,
    native_textures,
    native_warp,
)

pytestmark = pytest.mark.skipif(load_library() is None,
                                reason="native lib unavailable")


def test_textures_deterministic_and_normalized():
    a = native_textures(4, 64, 80, seed=7)
    b = native_textures(4, 64, 80, seed=7)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (4, 64, 80)
    assert a.min() >= 0.0 and a.max() <= 1.0
    # images differ from each other and have structure
    assert np.abs(a[0] - a[1]).mean() > 0.05
    assert a[0].std() > 0.05


def test_warp_matches_cv2():
    import cv2

    rng = np.random.default_rng(0)
    src = rng.random((2, 48, 64)).astype(np.float32)
    H = np.array([[0.95, 0.05, 3.0], [-0.04, 1.02, -2.0],
                  [1e-4, -5e-5, 1.0]])
    Hs = np.stack([H, np.linalg.inv(H)])
    out = native_warp(src, Hs)
    for i in range(2):
        ref = cv2.warpPerspective(src[i], Hs[i], (64, 48))
        # interiors agree; border handling differs slightly
        np.testing.assert_allclose(out[i][4:-4, 4:-4], ref[4:-4, 4:-4],
                                   atol=2e-3)
