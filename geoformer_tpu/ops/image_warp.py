"""On-device homography image warping (bilinear, zero border).

The reference warps training images on the CPU with cv2.warpPerspective and
kornia (reference: homodataset/HomoDataset.py:56-60, utils/homography.py:
258-297). Here warping runs inside jit on the accelerator, so the synthetic
homography pair pipeline never bottlenecks on host image processing.

Convention matches cv2.warpPerspective(src, M): the output at destination
pixel p takes the value src[M^{-1} p].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from geoformer_tpu.geometry.homography import grid_points, warp_points


def warp_image(img: jax.Array, H: jax.Array, inverse_map: bool = False
               ) -> jax.Array:
    """Warp [B, H, W, C] images by per-sample homographies [B, 3, 3].

    Args:
        img: [B, H, W, C].
        H: [B, 3, 3] forward mapping (src -> dst) unless ``inverse_map``.
    Returns:
        [B, H, W, C] warped images, zeros outside the source.
    """
    b, h, w, c = img.shape
    Minv = H if inverse_map else jnp.linalg.inv(H)
    pts = grid_points(h, w)                                # [HW, 2] dst (x, y)
    src = warp_points(pts[None], Minv)                     # [B, HW, 2]
    x, y = src[..., 0], src[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        lin = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        flat = img.reshape(b, h * w, c)
        vals = jnp.take_along_axis(flat, lin[..., None], axis=1)
        return jnp.where(inb[..., None], vals, 0.0)

    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)
    fxe = fx[..., None]
    fye = fy[..., None]
    out = (v00 * (1 - fxe) * (1 - fye) + v01 * fxe * (1 - fye)
           + v10 * (1 - fxe) * fye + v11 * fxe * fye)
    return out.reshape(b, h, w, c)
