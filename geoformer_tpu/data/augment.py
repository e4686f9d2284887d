"""Photometric augmentation stacks (on-device, jit-compatible).

Equivalent of the reference's albumentations augmentors (reference:
model/loftr_src/utils/augment.py:7-51 'dark'/'mobile' stacks and
homodataset/HomoDataset.py:56-60 brightness/contrast/motion-blur/noise).
Everything runs on the accelerator inside the data pipeline jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def random_brightness_contrast(key, img, brightness=0.2, contrast=0.2):
    kb, kc = jax.random.split(key)
    b = jax.random.uniform(kb, (img.shape[0], 1, 1, 1), minval=-brightness,
                           maxval=brightness)
    c = jax.random.uniform(kc, (img.shape[0], 1, 1, 1), minval=1 - contrast,
                           maxval=1 + contrast)
    return jnp.clip((img + b) * c, 0.0, 1.0)


def random_gamma(key, img, gamma_range=(0.8, 1.2)):
    g = jax.random.uniform(key, (img.shape[0], 1, 1, 1),
                           minval=gamma_range[0], maxval=gamma_range[1])
    return jnp.clip(img, 1e-6, 1.0) ** g


def gaussian_noise(key, img, sigma=0.02):
    return jnp.clip(img + sigma * jax.random.normal(key, img.shape), 0.0, 1.0)


def motion_blur(key, img, max_kernel: int = 5):
    """Random-direction motion blur via a small depthwise conv."""
    b = img.shape[0]
    k = max_kernel
    angle = jax.random.uniform(key, (b,), minval=0, maxval=jnp.pi)
    idx = jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2
    xs = jnp.cos(angle)[:, None] * idx[None]
    ys = jnp.sin(angle)[:, None] * idx[None]
    gx, gy = jnp.meshgrid(jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2,
                          jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2,
                          indexing="xy")
    # soft line kernel: gaussian falloff from the oriented line
    d = jnp.abs(-jnp.sin(angle)[:, None, None] * gx[None]
                + jnp.cos(angle)[:, None, None] * gy[None])
    kern = jnp.exp(-(d ** 2) / 0.5)
    kern = kern / kern.sum(axis=(1, 2), keepdims=True)       # [B, k, k]

    def conv_one(im, kk):
        return jax.lax.conv_general_dilated(
            im[None, ..., None] if im.ndim == 2 else im[None],
            kk[:, :, None, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

    return jax.vmap(conv_one)(img, kern)


def dark_aug(key, img):
    """'dark' stack: strong brightness/contrast drop + gamma + noise
    (augment.py:7-21 semantics)."""
    k1, k2, k3 = jax.random.split(key, 3)
    img = random_brightness_contrast(k1, img, brightness=0.4, contrast=0.4)
    img = random_gamma(k2, img, (1.0, 2.0))  # darken
    return gaussian_noise(k3, img, 0.03)


def mobile_aug(key, img):
    """'mobile' stack: motion blur + jitter + noise (augment.py:24-38)."""
    k1, k2, k3 = jax.random.split(key, 3)
    img = motion_blur(k1, img)
    img = random_brightness_contrast(k2, img)
    return gaussian_noise(k3, img, 0.02)


def shot_read_noise(key, img, gain_range=(2e-4, 4e-3),
                    read_range=(1e-5, 4e-4)):
    """Heteroscedastic sensor noise: variance = gain*signal + read^2.

    The Poisson-Gaussian model real sensors follow (shot noise scales with
    photon count, read noise doesn't) — unlike the flat gaussian_noise above,
    shadows get relatively noisier, as in real photos."""
    kg, kr, kn = jax.random.split(key, 3)
    b = img.shape[0]
    # log-uniform draws: ISO varies over orders of magnitude
    def logu(k, lo, hi):
        return jnp.exp(jax.random.uniform(k, (b, 1, 1, 1),
                                          minval=jnp.log(lo),
                                          maxval=jnp.log(hi)))
    gain = logu(kg, *gain_range)
    read2 = logu(kr, *read_range) ** 2
    sigma = jnp.sqrt(gain * jnp.clip(img, 0.0, 1.0) + read2)
    return jnp.clip(img + sigma * jax.random.normal(kn, img.shape), 0.0, 1.0)


_JPEG_LUMA_Q = jnp.asarray([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], jnp.float32)


def _dct8_matrix():
    n = jnp.arange(8, dtype=jnp.float32)
    k = n[:, None]
    C = jnp.cos((2 * n[None] + 1) * k * jnp.pi / 16)
    scale = jnp.where(k == 0, jnp.sqrt(1 / 8), jnp.sqrt(2 / 8))
    return scale * C  # orthonormal DCT-II, inverse = transpose


def jpeg_blocking(key, img, quality_range=(30, 90)):
    """JPEG luma compression artifacts: 8x8 block DCT -> quantize with the
    libjpeg luminance table at a random quality -> inverse DCT.

    Reproduces the blocking/ringing statistics of compressed photos. H and W
    are padded to multiples of 8 (edge mode) and cropped back."""
    b, h, w = img.shape[:3]
    q = jax.random.uniform(key, (b, 1, 1, 1, 1),
                           minval=quality_range[0], maxval=quality_range[1])
    # libjpeg quality scaling
    scale = jnp.where(q < 50, 5000.0 / q, 200.0 - 2.0 * q)
    qtbl = jnp.clip(jnp.floor((_JPEG_LUMA_Q * scale + 50.0) / 100.0), 1, 255)
    ph, pw = (-h) % 8, (-w) % 8
    x = img[..., 0] if img.ndim == 4 else img
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw)), mode="edge")
    hb, wb = (h + ph) // 8, (w + pw) // 8
    blocks = x.reshape(b, hb, 8, wb, 8).transpose(0, 1, 3, 2, 4) * 255.0 - 128.0
    D = _dct8_matrix()
    coef = jnp.einsum("ij,bhwjk,lk->bhwil", D, blocks, D)
    coef = jnp.round(coef / qtbl) * qtbl
    rec = jnp.einsum("ji,bhwjk,kl->bhwil", D, coef, D)
    rec = (rec + 128.0) / 255.0
    out = rec.transpose(0, 1, 3, 2, 4).reshape(b, hb * 8, wb * 8)[:, :h, :w]
    out = jnp.clip(out, 0.0, 1.0)
    return out[..., None] if img.ndim == 4 else out


def vignette(key, img, strength_range=(0.0, 0.6)):
    """Radial illumination falloff with a jittered optical center."""
    b, h, w = img.shape[:3]
    ks, kc = jax.random.split(key)
    s = jax.random.uniform(ks, (b, 1, 1), minval=strength_range[0],
                           maxval=strength_range[1])
    ctr = jax.random.uniform(kc, (b, 2, 1, 1), minval=-0.2, maxval=0.2)
    yy, xx = jnp.mgrid[0:h, 0:w]
    nx = (xx / (w - 1) - 0.5) * 2 - ctr[:, 0]
    ny = (yy / (h - 1) - 0.5) * 2 - ctr[:, 1]
    r2 = (nx ** 2 + ny ** 2) / 2.0
    fall = 1.0 - s * jnp.clip(r2, 0.0, 1.0)
    return img * (fall[..., None] if img.ndim == 4 else fall)


def defocus_blur(key, img, sigma_range=(0.0, 1.6), ksize: int = 7):
    """Gaussian defocus with a per-sample random sigma (separable convs).

    Grayscale stand-in for chromatic/defocus lens softness — the dominant
    low-pass difference between procedural textures and camera photos."""
    b = img.shape[0]
    sig = jax.random.uniform(key, (b, 1), minval=sigma_range[0],
                             maxval=sigma_range[1])
    idx = jnp.arange(ksize, dtype=jnp.float32) - (ksize - 1) / 2
    kern = jnp.exp(-(idx[None] ** 2) / (2 * jnp.maximum(sig, 0.05) ** 2))
    kern = kern / kern.sum(-1, keepdims=True)                   # [B, k]

    def conv_one(im, kk):
        x = im[None, ..., None] if im.ndim == 2 else im[None]
        x = jax.lax.conv_general_dilated(
            x, kk[:, None, None, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.lax.conv_general_dilated(
            x, kk[None, :, None, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x[0, ..., 0] if im.ndim == 2 else x[0]

    out = jax.vmap(conv_one)(img, kern)
    # sigma ~ 0 keeps the source exactly (kernel becomes a delta anyway,
    # but avoid boundary-tap softening on crisp procedural edges)
    keep = (sig < 0.1).reshape(b, *([1] * (img.ndim - 1)))
    return jnp.where(keep, img, out)


def sensor_aug(key, img):
    """Camera-realism stack: defocus -> vignette -> shot/read noise -> JPEG.

    Physical order (optics -> illumination -> sensor -> compression). Each
    stage draws per-sample strengths that include identity-ish settings, so
    the stack widens the photometric distribution instead of shifting it."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    img = defocus_blur(k1, img)
    img = vignette(k2, img)
    img = shot_read_noise(k3, img)
    return jpeg_blocking(k4, img)


def build_augmentor(method):
    """Mirror of build_augmentor (augment.py:41-51), plus the TPU-native
    'sensor' camera-realism stack (no reference counterpart)."""
    if method is None:
        return lambda key, img: img
    if method == "dark":
        return dark_aug
    if method == "mobile":
        return mobile_aug
    if method == "sensor":
        return sensor_aug
    raise ValueError(f"unknown augmentor {method}")
