"""Self-supervised homography pair pipeline.

TPU-native redesign of HomoDataset (reference: homodataset/HomoDataset.py:
30-177): the host only supplies base grayscale images (from a directory, or
procedural textures when no dataset is present); homography sampling, image
warping, valid masks, photometric augmentation, and the 50% pair swap all run
on the accelerator inside jit (data/synthetic.make_pair_batch).
"""

from __future__ import annotations

import glob
import os
from functools import partial
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from geoformer_tpu.geometry.homography import (
    grid_points,
    sample_homography,
    warp_points,
)
from geoformer_tpu.ops.image_warp import warp_image


def procedural_texture(rng: np.random.Generator, hw: Tuple[int, int],
                       n_blobs: int = 60) -> np.ndarray:
    """Structured grayscale texture (numpy fallback of cpp/synthgen.cpp):
    gaussian blobs + bands for low-frequency structure, value-noise octaves
    for high-frequency detail, and hard-edged rectangles / line segments /
    checker patches for the corners sub-pixel localization learns from."""
    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 0.15 * (xx / w) + 0.1 * (yy / h)
    cx = rng.uniform(0, w, n_blobs)
    cy = rng.uniform(0, h, n_blobs)
    s = rng.uniform(4, 40, n_blobs)
    a = rng.uniform(-0.6, 1.0, n_blobs)
    for i in range(n_blobs):
        img += a[i] * np.exp(-(((xx - cx[i]) ** 2 + (yy - cy[i]) ** 2)
                               / (2 * s[i] ** 2)))
    for _ in range(6):
        th = rng.uniform(0, np.pi)
        f = rng.uniform(0.01, 0.08)
        ph = rng.uniform(0, 2 * np.pi)
        img += 0.15 * np.sin(2 * np.pi * f *
                             (np.cos(th) * xx + np.sin(th) * yy) + ph)

    # value-noise octaves
    for cell in (32, 16, 8):
        amp = 0.10 * cell / 32 + 0.05
        gh, gw = h // cell + 2, w // cell + 2
        lat = rng.uniform(-1, 1, (gh, gw)).astype(np.float32)
        fy, fx = yy / cell, xx / cell
        y0 = fy.astype(np.int32)
        x0 = fx.astype(np.int32)
        ty, tx = fy - y0, fx - x0
        img += amp * ((1 - ty) * ((1 - tx) * lat[y0, x0]
                                  + tx * lat[y0, x0 + 1])
                      + ty * ((1 - tx) * lat[y0 + 1, x0]
                              + tx * lat[y0 + 1, x0 + 1]))

    # hard-edged rotated rectangles
    for _ in range(10):
        rcx, rcy = rng.uniform(0, w), rng.uniform(0, h)
        hw2, hh2 = rng.uniform(4, 0.25 * w), rng.uniform(4, 0.25 * h)
        th = rng.uniform(0, np.pi)
        amp = rng.uniform(-0.5, 0.5)
        u = np.cos(th) * (xx - rcx) + np.sin(th) * (yy - rcy)
        v = -np.sin(th) * (xx - rcx) + np.cos(th) * (yy - rcy)
        img += amp * ((np.abs(u) <= hw2) & (np.abs(v) <= hh2))

    # line segments
    for _ in range(12):
        ax_, ay_ = rng.uniform(0, w), rng.uniform(0, h)
        th = rng.uniform(0, 2 * np.pi)
        ln = rng.uniform(20, 0.8 * max(h, w))
        bx_, by_ = ax_ + ln * np.cos(th), ay_ + ln * np.sin(th)
        half = 0.5 * rng.uniform(1, 3)
        amp = rng.uniform(-0.6, 0.6)
        vx, vy = bx_ - ax_, by_ - ay_
        t = np.clip(((xx - ax_) * vx + (yy - ay_) * vy)
                    / max(vx * vx + vy * vy, 1e-6), 0, 1)
        d2 = (ax_ + t * vx - xx) ** 2 + (ay_ + t * vy - yy) ** 2
        img += amp * (d2 <= half * half)

    # occasional checkerboard patch
    if rng.uniform() < 0.35:
        cell = rng.uniform(6, 20)
        cx0, cy0 = int(rng.uniform(0, 0.6 * w)), int(rng.uniform(0, 0.6 * h))
        cw, ch = int(rng.uniform(0.25 * w, 0.5 * w)), int(
            rng.uniform(0.25 * h, 0.5 * h))
        amp = rng.uniform(0.25, 0.5)
        px = ((xx - cx0) / cell).astype(np.int32)
        py = ((yy - cy0) / cell).astype(np.int32)
        patch = ((px + py) % 2 * 2 - 1).astype(np.float32) * amp
        inside = ((xx >= cx0) & (xx < cx0 + cw)
                  & (yy >= cy0) & (yy < cy0 + ch))
        img += patch * inside

    img -= img.min()
    img /= max(img.max(), 1e-6)
    return img.astype(np.float32)


def _value_noise(rng: np.random.Generator, hw: Tuple[int, int],
                 cell: int) -> np.ndarray:
    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    gh, gw = h // cell + 2, w // cell + 2
    lat = rng.uniform(-1, 1, (gh, gw)).astype(np.float32)
    fy, fx = yy / cell, xx / cell
    y0, x0 = fy.astype(np.int32), fx.astype(np.int32)
    ty, tx = fy - y0, fx - x0
    return ((1 - ty) * ((1 - tx) * lat[y0, x0] + tx * lat[y0, x0 + 1])
            + ty * ((1 - tx) * lat[y0 + 1, x0] + tx * lat[y0 + 1, x0 + 1]))


def dead_leaves_texture(rng: np.random.Generator,
                        hw: Tuple[int, int]) -> np.ndarray:
    """Dead-leaves model (numpy twin of cpp texture_dead_leaves): occluding
    anti-aliased disks with p(r) ~ r^-3 radii — natural-image statistics
    (1/f-like spectrum, occlusion edges at every scale)."""
    h, w = hw
    img = np.full((h, w), rng.uniform(0.2, 0.8), np.float32)
    rmin, rmax = 2.5, 0.35 * min(h, w)
    q2 = (rmin / rmax) ** 2
    for _ in range(4000):
        r = rmin / np.sqrt(1.0 - rng.uniform() * (1.0 - q2))
        cx, cy = rng.uniform(-r, w + r), rng.uniform(-r, h + r)
        col = rng.uniform(0.05, 0.95)
        gx = rng.uniform(-0.25, 0.25) / max(r, 1.0)
        gy = rng.uniform(-0.25, 0.25) / max(r, 1.0)
        x0, x1 = max(0, int(cx - r - 1)), min(w, int(cx + r) + 2)
        y0, y1 = max(0, int(cy - r - 1)), min(h, int(cy + r) + 2)
        if x0 >= x1 or y0 >= y1:
            continue
        dx = np.arange(x0, x1, dtype=np.float32) - cx
        dy = (np.arange(y0, y1, dtype=np.float32) - cy)[:, None]
        d = np.sqrt(dx * dx + dy * dy)
        alpha = np.clip(r - d + 0.5, 0.0, 1.0)
        shade = np.clip(col + gx * dx + gy * dy, 0.0, 1.0)
        win = img[y0:y1, x0:x1]
        img[y0:y1, x0:x1] = alpha * shade + (1 - alpha) * win
    img += 0.04 * _value_noise(rng, hw, 4)
    return _normalize_robust(img)


def _normalize_robust(img: np.ndarray) -> np.ndarray:
    """2%-98% percentile stretch to [0,1] (cpp normalize_robust twin):
    real-photo-like contrast instead of min-max's timid std."""
    lo, hi = np.percentile(img, [2.0, 98.0])
    return np.clip((img - lo) / max(hi - lo, 1e-3), 0.0, 1.0
                   ).astype(np.float32)


def fbm_texture(rng: np.random.Generator, hw: Tuple[int, int]) -> np.ndarray:
    """Fractal value noise (~1/f^2 spectrum) + hard-edged rectangles
    (numpy twin of cpp texture_fbm)."""
    h, w = hw
    img = np.zeros((h, w), np.float32)
    amp = 0.5
    cell = 128
    while cell >= 4:
        if cell < min(h, w):
            img += amp * _value_noise(rng, hw, cell)
        amp *= 0.62
        cell //= 2
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for _ in range(6):
        rcx, rcy = rng.uniform(0, w), rng.uniform(0, h)
        hw2, hh2 = rng.uniform(4, 0.25 * w), rng.uniform(4, 0.25 * h)
        th = rng.uniform(0, np.pi)
        a = rng.uniform(-0.35, 0.35)
        u = np.cos(th) * (xx - rcx) + np.sin(th) * (yy - rcy)
        v = -np.sin(th) * (xx - rcx) + np.cos(th) * (yy - rcy)
        img += a * ((np.abs(u) <= hw2) & (np.abs(v) <= hh2))
    return _normalize_robust(img)


def mixed_texture_bank(rng: np.random.Generator, hw: Tuple[int, int],
                       n: int) -> np.ndarray:
    """[n, H, W] bank, one third each structured / dead-leaves / fBm."""
    gens = (procedural_texture, dead_leaves_texture, fbm_texture)
    return np.stack([gens[i % 3](rng, hw) for i in range(n)])


def load_image_dir(root: str, hw: Tuple[int, int]) -> Optional[np.ndarray]:
    """Load grayscale images (jpg/png/ppm) resized to hw; None if dir empty."""
    try:
        import cv2
    except ImportError:
        return None
    paths = sorted(sum((glob.glob(os.path.join(root, "**", e), recursive=True)
                        for e in ("*.jpg", "*.png", "*.ppm")), []))
    if not paths:
        return None
    h, w = hw
    out = []
    for p in paths:
        im = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        if im is None:
            continue
        out.append(cv2.resize(im, (w, h)).astype(np.float32) / 255.0)
    return np.stack(out) if out else None


@partial(jax.jit, static_argnames=("coarse_scale", "sensor"))
def make_pair_batch(base: jax.Array, key: jax.Array, coarse_scale: int = 8,
                    sensor: bool = False):
    """Turn base images [B, H, W] into supervised homography pairs on-device.

    Mirrors HomoDataset.get_pair (HomoDataset.py:83-158): sample H, warp,
    photometric jitter, compute coarse-resolution valid masks from the warp,
    and swap the pair (with H^{-1}) for half the samples.

    sensor=True additionally passes BOTH views through the camera-realism
    stack (augment.sensor_aug: defocus/vignette/shot-read-noise/JPEG) with
    independent per-view draws — the offline lever against the measured
    real-photo gap (RESULTS.md; labels are unchanged since the stack is
    purely photometric).

    Returns dict: image0/image1 [B,H,W,1], H_0to1/H_1to0 [B,3,3],
    mask0/mask1 [B, H/8, W/8].
    """
    b, h, w = base.shape
    keys = jax.random.split(key, 6)
    Hs = jax.vmap(lambda k: sample_homography(k, (h, w)))(
        jax.random.split(keys[0], b))

    img0 = base[..., None]
    img1 = warp_image(img0, Hs)

    # photometric jitter on the warped view (stand-in for the reference's
    # albumentations brightness/contrast/blur/noise stack)
    kb, kc, kn, kg, kbl = jax.random.split(keys[1], 5)
    bright = jax.random.uniform(kb, (b, 1, 1, 1), minval=-0.1, maxval=0.1)
    contrast = jax.random.uniform(kc, (b, 1, 1, 1), minval=0.8, maxval=1.2)
    noise = 0.02 * jax.random.normal(kn, img1.shape)
    gamma = jax.random.uniform(kg, (b, 1, 1, 1), minval=0.75, maxval=1.35)
    img1 = jnp.clip((img1 + bright) * contrast, 0.0, 1.0) ** gamma
    # 30% of samples get a 3x3 box blur (motion-blur stand-in)
    blur = jax.lax.conv_general_dilated(
        img1, jnp.full((3, 3, 1, 1), 1.0 / 9.0, img1.dtype), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    do_blur = jax.random.uniform(kbl, (b, 1, 1, 1)) < 0.3
    img1 = jnp.clip(jnp.where(do_blur, blur, img1) + noise, 0.0, 1.0)

    if sensor:
        from geoformer_tpu.data.augment import sensor_aug

        ks0, ks1 = jax.random.split(keys[5])
        img0 = sensor_aug(ks0, img0)
        img1 = sensor_aug(ks1, img1)

    # coarse-resolution validity: cell center maps inside the source image
    hc, wc = h // coarse_scale, w // coarse_scale
    centers = grid_points(hc, wc, coarse_scale) + coarse_scale / 2
    Hinv = jnp.linalg.inv(Hs)
    src = warp_points(centers[None], Hinv)
    inb = ((src[..., 0] >= 0) & (src[..., 0] < w)
           & (src[..., 1] >= 0) & (src[..., 1] < h))
    mask1 = inb.reshape(b, hc, wc).astype(jnp.float32)
    mask0 = jnp.ones((b, hc, wc), jnp.float32)

    # 50% swap with inverse homography (HomoDataset.py:151-158)
    swap = jax.random.uniform(keys[4], (b, 1, 1, 1)) < 0.5
    i0 = jnp.where(swap, img1, img0)
    i1 = jnp.where(swap, img0, img1)
    swap_b = swap[:, 0, 0, 0]
    H01 = jnp.where(swap_b[:, None, None], Hinv, Hs)
    H10 = jnp.where(swap_b[:, None, None], Hs, Hinv)
    m0 = jnp.where(swap_b[:, None, None], mask1, mask0)
    m1 = jnp.where(swap_b[:, None, None], mask0, mask1)

    return {"image0": i0, "image1": i1, "H_0to1": H01, "H_1to0": H10,
            "mask0": m0, "mask1": m1}


def _procedural_bank(hw: Tuple[int, int], seed: int,
                     texture_style: str,
                     rng: np.random.Generator,
                     size: int = 256) -> np.ndarray:
    """[n, H, W] procedural bank (C++ fast path, numpy fallback)."""
    from geoformer_tpu.data.native import (
        native_textures,
        native_textures_mixed,
    )

    gen = (native_textures_mixed if texture_style == "mixed"
           else native_textures)
    bank = gen(size, hw[0], hw[1], seed)  # C++ fast path
    if bank is None:
        bank = (mixed_texture_bank(rng, hw, max(64, size // 4))
                if texture_style == "mixed"
                else np.stack([procedural_texture(rng, hw)
                               for _ in range(max(64, size // 4))]))
    return bank


def base_image_stream(hw: Tuple[int, int], batch: int, seed: int = 0,
                      image_dir: Optional[str] = None,
                      texture_style: str = "mixed",
                      image_fraction: float = 1.0,
                      bank_size: int = 256,
                      bank_refresh: int = 0) -> Iterator[np.ndarray]:
    """Endless stream of [batch, H, W] base images (dataset dir or procedural).

    texture_style: "mixed" (default; structured + dead-leaves + fBm — closes
    the measured real-photo domain gap, RESULTS.md) or "structured" (the
    round-1/2 single-family bank, kept for comparability).

    image_fraction: when ``image_dir`` is given, the per-sample probability
    of drawing from the image bank; the rest comes from the procedural bank.
    1.0 (default) keeps the reference HomoDataset semantics (dataset images
    only, HomoDataset.py:30-60); fractions in (0, 1) blend a small real-image
    corpus with procedural textures so a few dozen photos don't collapse the
    training distribution's diversity.

    bank_size / bank_refresh: corpus-scale levers (VERDICT r4 next #6).
    bank_size sets the procedural bank's image count; bank_refresh > 0
    regenerates the bank with a fresh seed every that-many batches, making
    the effective corpus unbounded (cpp/synthgen.cpp keeps regeneration in
    the multithreaded C++ path; a 1024-image 480x640 bank is ~seconds,
    amortized over hundreds of steps).
    """
    rng = np.random.default_rng(seed)
    img_bank = load_image_dir(image_dir, hw) if image_dir else None
    if img_bank is None:
        img_bank, image_fraction = None, 0.0
    proc_bank = (None if image_fraction >= 1.0
                 else _procedural_bank(hw, seed, texture_style, rng,
                                       size=bank_size))
    n_yield = 0
    while True:
        if (bank_refresh > 0 and proc_bank is not None and n_yield > 0
                and n_yield % bank_refresh == 0):
            proc_bank = _procedural_bank(
                hw, seed + 1009 * (n_yield // bank_refresh),
                texture_style, rng, size=bank_size)
        n_yield += 1
        if proc_bank is None:
            yield img_bank[rng.integers(0, len(img_bank), size=batch)]
        elif img_bank is None or image_fraction <= 0.0:
            yield proc_bank[rng.integers(0, len(proc_bank), size=batch)]
        else:
            use_img = rng.random(batch) < image_fraction
            out = proc_bank[rng.integers(0, len(proc_bank), size=batch)].copy()
            n_img = int(use_img.sum())
            if n_img:
                out[use_img] = img_bank[
                    rng.integers(0, len(img_bank), size=n_img)]
            yield out
