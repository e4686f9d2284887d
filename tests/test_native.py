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


def test_mixed_texture_bank_styles():
    """Mixed bank: style 0 rows bit-match the single-style generator
    (selfcheck protocol unchanged); dead-leaves/fBm rows have real-photo-like
    contrast; numpy twins land in the same statistical regime."""
    from geoformer_tpu.data.native import native_textures_mixed
    from geoformer_tpu.data.synthetic import (
        dead_leaves_texture,
        fbm_texture,
    )

    mixed = native_textures_mixed(6, 96, 128, seed=11)
    single = native_textures(6, 96, 128, seed=11)
    assert mixed.shape == (6, 96, 128)
    assert mixed.min() >= 0.0 and mixed.max() <= 1.0
    # index % 3 == 0 rows are the structured family, bit-identical
    np.testing.assert_array_equal(mixed[0], single[0])
    np.testing.assert_array_equal(mixed[3], single[3])
    # dead-leaves rows: robust-stretched occlusion texture (higher contrast)
    for i in (1, 4):
        assert mixed[i].std() > 0.15, mixed[i].std()
    # numpy twins are the same family statistically (not bit-identical)
    rng = np.random.default_rng(3)
    dl = dead_leaves_texture(rng, (96, 128))
    fb = fbm_texture(rng, (96, 128))
    assert dl.shape == (96, 128) and fb.shape == (96, 128)
    assert 0.12 < dl.std() < 0.4 and 0.1 < fb.std() < 0.4
    assert dl.min() >= 0.0 and dl.max() <= 1.0


def test_base_image_stream_styles():
    from geoformer_tpu.data.synthetic import base_image_stream

    s_mixed = next(base_image_stream((48, 64), 3, seed=5,
                                     texture_style="mixed"))
    s_struct = next(base_image_stream((48, 64), 3, seed=5,
                                      texture_style="structured"))
    assert s_mixed.shape == (3, 48, 64) and s_struct.shape == (3, 48, 64)
    # different banks (mixed includes dead-leaves/fBm entries)
    assert np.abs(s_mixed - s_struct).mean() > 1e-3


def test_base_image_stream_image_mix(tmp_path):
    """--data-mix blends an image-dir bank with the procedural bank."""
    import cv2

    from geoformer_tpu.data.synthetic import base_image_stream

    # two constant 'photos' (values no procedural texture produces exactly)
    for i, val in enumerate((40, 200)):
        cv2.imwrite(str(tmp_path / f"im{i}.png"),
                    np.full((64, 80), val, np.uint8))

    def is_flat(im):
        return im.std() < 1e-6

    # fraction 1.0 -> image bank only (HomoDataset semantics)
    batch = next(base_image_stream((48, 64), 8, seed=0,
                                   image_dir=str(tmp_path)))
    assert batch.shape == (8, 48, 64)
    assert all(is_flat(im) for im in batch)

    # fraction 0.5 -> both sources appear across a few batches
    stream = base_image_stream((48, 64), 8, seed=0,
                               image_dir=str(tmp_path), image_fraction=0.5)
    flags = [is_flat(im) for _ in range(4) for im in next(stream)]
    assert any(flags) and not all(flags)

    # fraction 0 -> procedural only, and identical to the no-dir stream
    b0 = next(base_image_stream((48, 64), 4, seed=7,
                                image_dir=str(tmp_path), image_fraction=0.0))
    b1 = next(base_image_stream((48, 64), 4, seed=7))
    np.testing.assert_allclose(b0, b1)


def test_base_image_stream_bank_refresh():
    """bank_refresh regenerates the procedural bank on schedule; bank_size
    is respected (corpus-scale levers, VERDICT r4 next #6)."""
    from geoformer_tpu.data.synthetic import base_image_stream

    # Deterministic: same seed + params -> identical stream.
    a = base_image_stream((48, 64), 4, seed=3, bank_size=8, bank_refresh=2)
    b = base_image_stream((48, 64), 4, seed=3, bank_size=8, bank_refresh=2)
    batches_a = [next(a) for _ in range(5)]
    batches_b = [next(b) for _ in range(5)]
    for x, y in zip(batches_a, batches_b):
        np.testing.assert_allclose(x, y)

    # A refreshing stream diverges from the fixed-bank stream after the
    # refresh point (same seed, so the first batches draw the same bank).
    fixed = base_image_stream((48, 64), 4, seed=3, bank_size=8)
    fixed_batches = [next(fixed) for _ in range(5)]
    np.testing.assert_allclose(batches_a[0], fixed_batches[0])
    assert any(
        not np.allclose(x, y)
        for x, y in zip(batches_a[2:], fixed_batches[2:])
    )
