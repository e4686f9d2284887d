"""Sensor-realism augmentation stack (data/augment.py, VERDICT r3 #6)."""

import jax
import jax.numpy as jnp
import numpy as np

from geoformer_tpu.data.augment import (
    build_augmentor,
    defocus_blur,
    jpeg_blocking,
    sensor_aug,
    shot_read_noise,
    vignette,
)


def _img(b=2, h=48, w=64, channels=True, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random((b, h, w) + ((1,) if channels else ())).astype(np.float32)
    return jnp.asarray(x)


def test_shot_noise_scales_with_signal():
    key = jax.random.key(0)
    b, n = 64, 64
    dark = jnp.full((b, n, n, 1), 0.05)
    bright = jnp.full((b, n, n, 1), 0.6)
    # same key = same gain/read draws; bright pixels must be noisier in
    # absolute terms (shot noise), unlike flat additive noise
    sd_dark = float(jnp.std(shot_read_noise(key, dark) - dark))
    sd_bright = float(jnp.std(shot_read_noise(key, bright) - bright))
    assert sd_bright > 1.5 * sd_dark


def test_jpeg_blocking_roundtrip_properties():
    img = _img(h=40, w=56)  # exercises the pad-to-8 path
    out = jpeg_blocking(jax.random.key(1), img)
    assert out.shape == img.shape
    assert float(out.min()) >= 0 and float(out.max()) <= 1
    # lossy: must actually change the image...
    assert float(jnp.abs(out - img).mean()) > 1e-4
    # ...but keep it recognizable (quantization, not destruction)
    assert float(jnp.abs(out - img).mean()) < 0.15


def test_jpeg_high_quality_changes_less_than_low():
    img = _img(h=48, w=64)
    hi = jpeg_blocking(jax.random.key(2), img, quality_range=(92, 95))
    lo = jpeg_blocking(jax.random.key(2), img, quality_range=(12, 15))
    assert float(jnp.abs(hi - img).mean()) < float(jnp.abs(lo - img).mean())


def test_vignette_darkens_corners_not_center():
    img = jnp.ones((4, 64, 64, 1))
    out = vignette(jax.random.key(3), img, strength_range=(0.5, 0.5))
    center = float(out[:, 30:34, 30:34].mean())
    corner = float(out[:, :4, :4].mean())
    assert corner < center
    assert center > 0.9


def test_defocus_blur_reduces_gradient_energy():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((4, 48, 64, 1)).astype(np.float32))
    out = defocus_blur(jax.random.key(5), img, sigma_range=(1.5, 1.5))

    def grad_energy(x):
        return float(jnp.abs(jnp.diff(x, axis=2)).mean())

    assert grad_energy(out) < grad_energy(img)
    # near-zero sigma keeps the image untouched (the keep-branch)
    same = defocus_blur(jax.random.key(6), img, sigma_range=(0.0, 0.0))
    np.testing.assert_allclose(np.asarray(same), np.asarray(img))


def test_sensor_aug_jits_and_stays_in_range():
    img = _img(b=3, h=48, w=64)
    out = jax.jit(sensor_aug)(jax.random.key(7), img)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()
    assert float(out.min()) >= 0 and float(out.max()) <= 1.0 + 1e-6
    assert build_augmentor("sensor") is sensor_aug


def test_make_pair_batch_sensor_flag():
    from geoformer_tpu.data.synthetic import make_pair_batch

    rng = np.random.default_rng(8)
    base = jnp.asarray(rng.random((2, 64, 80)).astype(np.float32))
    plain = make_pair_batch(base, jax.random.key(9))
    aug = make_pair_batch(base, jax.random.key(9), sensor=True)
    # geometry (labels) is identical; photometrics differ on both views
    np.testing.assert_allclose(np.asarray(plain["H_0to1"]),
                               np.asarray(aug["H_0to1"]), rtol=1e-6)
    assert float(jnp.abs(plain["image0"] - aug["image0"]).mean()) > 1e-5
    assert float(jnp.abs(plain["image1"] - aug["image1"]).mean()) > 1e-5
