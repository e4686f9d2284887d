"""Batched eval-time matcher: image loading, resolution bucketing, jit cache.

Replaces the reference's one-pair-at-a-time wrapper (reference:
eval_tool/immatch/modules/geoformer.py:41-99, utils/data_io.py:16-62) with a
bucketed, padded, batched pipeline: images are min-edge resized (/8-divisible),
zero-padded into a per-bucket static shape with coarse masks, and matched in
fixed-shape batches so XLA compiles once per bucket.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from geoformer_tpu.config import GeoFormerConfig
from geoformer_tpu.models import GeoFormer


def resize_shape(wo: int, ho: int, imsize: Optional[int], dfactor: int = 8,
                 use_min: bool = True) -> Tuple[int, int, Tuple[float, float]]:
    """Target (wt, ht) and (sx, sy) scale, mirroring resize_im
    (data_io.py:16-26): resize only when the chosen edge exceeds imsize, then
    floor both edges to the dfactor grid."""
    wt, ht = wo, ho
    edge = min(wo, ho) if use_min else max(wo, ho)
    if imsize and imsize > 0 and edge > imsize:
        s = imsize / edge
        ht, wt = int(round(ho * s)), int(round(wo * s))
    wt, ht = (wt // dfactor) * dfactor, (ht // dfactor) * dfactor
    return wt, ht, (wo / wt, ho / ht)


def ratio_preserving_resize(im: np.ndarray, target_hw) -> np.ndarray:
    """Resize keeping aspect ratio (max scale), then center-crop/pad to
    target (reference: utils/homography.py:698-720, minus the imgaug dep).

    Parity API only: the reference uses this in its SuperPoint-style data
    tooling, not in any benchmark loader — the benchmark image path here is
    load_gray/resize_shape (resize_im semantics). Exposed so migrating
    users keep the function; nothing in the eval pipeline calls it."""
    import cv2

    th, tw = target_hw
    h, w = im.shape[:2]
    s = max(th / h, tw / w)
    nh, nw = int(round(h * s)), int(round(w * s))
    tmp = cv2.resize(im, (nw, nh))
    # center crop-or-pad each axis to target
    out = np.zeros((th, tw) + im.shape[2:], tmp.dtype)
    dy, dx = (th - nh) // 2, (tw - nw) // 2
    sy0, ty0 = (max(-dy, 0), max(dy, 0))
    sx0, tx0 = (max(-dx, 0), max(dx, 0))
    ch, cw = min(nh, th), min(nw, tw)
    out[ty0:ty0 + ch, tx0:tx0 + cw] = tmp[sy0:sy0 + ch, sx0:sx0 + cw]
    return out


def enhance_retinal(im: np.ndarray) -> np.ndarray:
    """Retinal image enhancement: normalize -> CLAHE -> gamma 1.2
    (reference: utils/common_utils.py:210-246). uint8 in, uint8 out."""
    import cv2

    x = im.astype(np.float64)
    x = (x - x.mean()) / (x.std() + 1e-6)
    x = (x - x.min()) / (x.max() - x.min()) * 255
    clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
    x = clahe.apply(x.astype(np.uint8))
    inv = 1.0 / 1.2
    table = (((np.arange(256) / 255.0) ** inv) * 255).astype(np.uint8)
    return cv2.LUT(x, table)


def load_gray(path: str, imsize: Optional[int], dfactor: int = 8,
              enhanced: bool = False
              ) -> Tuple[np.ndarray, Tuple[float, float]]:
    import cv2

    im = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if im is None:
        raise FileNotFoundError(f"cannot read image: {path}")
    if enhanced:
        im = enhance_retinal(im)
    ho, wo = im.shape
    wt, ht, scale = resize_shape(wo, ho, imsize, dfactor)
    im = cv2.resize(im, (wt, ht))
    return im.astype(np.float32) / 255.0, scale


def bucket_shape(h: int, w: int, quant: int = 64) -> Tuple[int, int]:
    return (math.ceil(h / quant) * quant, math.ceil(w / quant) * quant)


class BatchedMatcher:
    """jit-cached batched GeoFormer matcher over padded buckets.

    Pass ``mesh`` (a 1-axis `jax.sharding.Mesh`) to run eval data-parallel:
    params replicate, the pair batch shards over the mesh axis, and each
    chip matches ``batch_size / n_devices`` pairs per call — the same
    `P(axis)` pattern as training (train/trainer.shard_train_step), so a
    pod slice speeds up benchmark sweeps with no driver changes.

    Pass ``seq_mesh`` instead to run sequence-parallel: each PAIR is
    sharded over the mesh token dim (GeoFormerConfig.seq_axis,
    docs/SCALING.md) — the high-resolution path, for images too large to
    match on one chip. Mutually exclusive with ``mesh``.
    """

    def __init__(self, config: GeoFormerConfig, params, batch_size: int = 4,
                 mesh=None, seq_mesh=None):
        self.seq_mesh = seq_mesh
        if seq_mesh is not None:
            assert mesh is None, "mesh and seq_mesh are mutually exclusive"
            config = config.replace(seq_axis=seq_mesh.axis_names[0])
        self.model = GeoFormer(config)
        self.params = params
        self.batch_size = batch_size
        self.cfg = config
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = int(np.prod(mesh.devices.shape))
            assert batch_size % n_dev == 0, (batch_size, n_dev)
            self._repl = NamedSharding(mesh, P())
            self._data = NamedSharding(mesh, P(mesh.axis_names[0]))
            self.params = jax.device_put(params, self._repl)
        self._jit_cache: Dict[Tuple[int, int], callable] = {}

    def _get_fn(self, hw: Tuple[int, int]):
        if hw not in self._jit_cache:
            def fwd(params, i0, i1, m0, m1):
                return self.model.apply(
                    params, i0, i1, mask0=m0, mask1=m1,
                    rngs={"ransac": jax.random.key(0)})

            if self.seq_mesh is not None:
                base = jax.jit(fwd)

                def fwd_sp(*a):
                    # the ambient mesh must be set while tracing AND calling
                    with jax.sharding.set_mesh(self.seq_mesh):
                        return base(*a)

                fwd = fwd_sp
            elif self.mesh is None:
                fwd = jax.jit(fwd)
            else:
                fwd = jax.jit(
                    fwd,
                    in_shardings=(self._repl,) + (self._data,) * 4,
                    out_shardings=self._data)
            self._jit_cache[hw] = fwd
        return self._jit_cache[hw]

    def pair_bucket(self, shape0, shape1) -> Tuple[int, int]:
        """The compile bucket a pair of (h, w) resized shapes lands in."""
        shapes = [bucket_shape(*shape0), bucket_shape(*shape1)]
        return (max(h for h, _ in shapes), max(w for _, w in shapes))

    def prewarm(self, pair_shapes, log=print):
        """Compile every resolution bucket up front.

        Real benchmarks (HPatches: many aspect ratios) hit several 64-px
        buckets; compiling them before the pair loop makes the eval
        wall-clock predictable and makes the compile cost visible instead
        of smeared over the first pair of each bucket.

        Args:
            pair_shapes: iterable of ((h0, w0), (h1, w1)) RESIZED shapes.
        """
        import time

        buckets: Dict[Tuple[int, int], int] = {}
        for s0, s1 in pair_shapes:
            hw = self.pair_bucket(s0, s1)
            buckets[hw] = buckets.get(hw, 0) + 1
        log(f"prewarm: {len(buckets)} bucket(s): " + ", ".join(
            f"{h}x{w} (x{c})" for (h, w), c in sorted(buckets.items())))
        s = self.cfg.coarse_scale
        for i, (H, W) in enumerate(sorted(buckets)):
            t0 = time.time()
            fn = self._get_fn((H, W))
            res = fn(self.params,
                     jnp.zeros((self.batch_size, H, W, 1)),
                     jnp.zeros((self.batch_size, H, W, 1)),
                     jnp.ones((self.batch_size, H // s, W // s)),
                     jnp.ones((self.batch_size, H // s, W // s)))
            jax.block_until_ready(res)
            log(f"prewarm {i + 1}/{len(buckets)}: {H}x{W} "
                f"compiled in {time.time() - t0:.1f}s")

    def match_batch(self, imgs0: List[np.ndarray], imgs1: List[np.ndarray],
                    return_geo: bool = False):
        """Match a list of same-bucket image pairs (arbitrary true sizes).

        Returns per-pair (mkpts0 [K,2], mkpts1 [K,2], mconf [K]) in the
        resized (pre-padding) pixel frame. With return_geo=True each tuple
        gains a 4th element: the pair's GAM state
        {'H' [3,3], 'has_H' bool, 'num_inliers' int} — the input to
        utils/plotting.make_geo_window_figure when debugging the GAM.
        """
        s = self.cfg.coarse_scale
        # elementwise max over bucketed shapes (lexicographic tuple-max would
        # drop the width of a shorter-but-wider image)
        shapes = [bucket_shape(*im.shape) for im in imgs0 + imgs1]
        H = max(h for h, _ in shapes)
        W = max(w for _, w in shapes)
        n = len(imgs0)
        b = self.batch_size
        out = []
        for start in range(0, n, b):
            chunk0 = imgs0[start:start + b]
            chunk1 = imgs1[start:start + b]
            k = len(chunk0)
            i0 = np.zeros((b, H, W, 1), np.float32)
            i1 = np.zeros((b, H, W, 1), np.float32)
            m0 = np.zeros((b, H // s, W // s), np.float32)
            m1 = np.zeros((b, H // s, W // s), np.float32)
            for j, (a, c) in enumerate(zip(chunk0, chunk1)):
                i0[j, :a.shape[0], :a.shape[1], 0] = a
                i1[j, :c.shape[0], :c.shape[1], 0] = c
                m0[j, :a.shape[0] // s, :a.shape[1] // s] = 1.0
                m1[j, :c.shape[0] // s, :c.shape[1] // s] = 1.0
            fn = self._get_fn((H, W))
            res = fn(self.params, jnp.asarray(i0), jnp.asarray(i1),
                     jnp.asarray(m0), jnp.asarray(m1))
            mk0 = np.asarray(res.fine.mkpts0)
            mk1 = np.asarray(res.fine.mkpts1)
            mc = np.asarray(res.fine.mconf)
            valid = np.asarray(res.fine.valid)
            for j in range(k):
                v = valid[j]
                row = (mk0[j][v], mk1[j][v], mc[j][v])
                if return_geo:
                    row += ({"H": np.asarray(res.geo.H[j]),
                             "has_H": bool(res.geo.has_H[j]),
                             "num_inliers": int(res.geo.num_inliers[j])},)
                out.append(row)
        return out
