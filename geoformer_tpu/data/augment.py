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


def build_augmentor(method):
    """Mirror of build_augmentor (augment.py:41-51)."""
    if method is None:
        return lambda key, img: img
    if method == "dark":
        return dark_aug
    if method == "mobile":
        return mobile_aug
    raise ValueError(f"unknown augmentor {method}")
