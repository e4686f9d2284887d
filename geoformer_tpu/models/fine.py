"""Fine-level window matching.

Re-design of FinePreprocess + fine LoFTR + FineMatching2 (reference:
model/loftr_src/loftr/loftr_module/fine_preprocess.py:8-74,
model/fine_matching2.py:13-126) with fixed capacities:

  * window gather replaces F.unfold-everything-then-index: we gather the 5x5
    fine-resolution window around each matched coarse cell directly,
  * the fine transformer treats each window pair as a batch element,
  * FineMatching2's decode — threshold, mutual-NN, keep-global-argmax
    (``non_mask``) — becomes a pure argmax + gate, since the reference's mask
    algebra reduces to "take the single global argmax cell of the 25x25
    confidence if it passes threshold + mutual-NN; otherwise drop the match".
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from geoformer_tpu.config import FineMatchConfig, FineTransformerConfig
from geoformer_tpu.models.coarse_matching import CoarseMatches, match_coords
from geoformer_tpu.models.transformer import LocalFeatureTransformer
from geoformer_tpu.ops.matching import dual_softmax


class FineMatches(NamedTuple):
    """Final match set (resized-image pixel coordinates).

    fine_conf: [B, M, WW, WW] fine dual-softmax matrix (for the loss).
    mkpts0/mkpts1: [B, M, 2]; mconf: [B, M]; valid: [B, M].
    """

    fine_conf: jax.Array
    mkpts0: jax.Array
    mkpts1: jax.Array
    mconf: jax.Array
    valid: jax.Array


def gather_windows(feat_f: jax.Array, ids: jax.Array, grid_w_c: int,
                   stride: int, window: int) -> jax.Array:
    """Gather [M, W*W, C] fine-feature windows centered at coarse cells.

    Equivalent to F.unfold(kernel=W, stride=stride, padding=W//2) followed by
    indexing at the matched coarse ids (fine_preprocess.py:41-56).

    Args:
        feat_f: [B, hf, wf, C] fine features.
        ids: [B, M] coarse cell ids.
        grid_w_c: coarse grid width (wf // stride).
        stride: fine cells per coarse cell (4 for the (8,2) ladder).
        window: window size W (odd).
    """
    b, hf, wf, c = feat_f.shape
    r = window // 2
    padded = jnp.pad(feat_f, ((0, 0), (r, r), (r, r), (0, 0)))
    rows = (ids // grid_w_c) * stride                      # top-left in padded
    cols = (ids % grid_w_c) * stride
    # vmapped dynamic_slice -> one gather with slice_sizes (W, W, C):
    # each slice moves W contiguous W*C-byte rows instead of W*W separate
    # C-rows (the element-indexed form cost 4.8 ms/fwd in the round-5
    # device trace; contiguous slices are the TPU-friendly access).
    win = jax.vmap(jax.vmap(
        lambda f, y, x: jax.lax.dynamic_slice(f, (y, x, 0),
                                              (window, window, c)),
        in_axes=(None, 0, 0)), in_axes=(0, 0, 0))(padded, rows, cols)
    return win.reshape(b, ids.shape[1], window * window, c)


class FinePreprocess(nn.Module):
    """Window gather + optional coarse-context fusion
    (fine_preprocess.py:30-74)."""

    d_model_f: int
    d_model_c: int
    window: int = 5
    concat_coarse: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat_f0, feat_f1, feat_c0, feat_c1,
                 matches: CoarseMatches, stride: int, grid_w0: int,
                 grid_w1: int):
        w0 = gather_windows(feat_f0, matches.i_ids, grid_w0, stride,
                            self.window)                    # [B, M, WW, Cf]
        w1 = gather_windows(feat_f1, matches.j_ids, grid_w1, stride,
                            self.window)
        if self.concat_coarse:
            down = nn.Dense(self.d_model_f, use_bias=True, dtype=self.dtype,
                            name="down_proj")
            merge = nn.Dense(self.d_model_f, use_bias=True, dtype=self.dtype,
                             name="merge_feat")
            take = jax.vmap(lambda f, i: jnp.take(f, i, axis=0))
            c0 = down(take(feat_c0, matches.i_ids))         # [B, M, Cf]
            c1 = down(take(feat_c1, matches.j_ids))
            ww = self.window * self.window
            w0 = merge(jnp.concatenate(
                [w0, jnp.repeat(c0[:, :, None, :], ww, axis=2)], axis=-1))
            w1 = merge(jnp.concatenate(
                [w1, jnp.repeat(c1[:, :, None, :], ww, axis=2)], axis=-1))
        return w0, w1


def fine_matching(fine_conf: jax.Array, matches: CoarseMatches,
                  grid_w0: int, grid_w1: int, coarse_scale: int,
                  fine_scale: int, window: int, thr: float) -> FineMatches:
    """Decode fine matches from the window-window confidence
    (fine_matching2.py:69-126).

    fine_conf: [B, M, WW, WW].
    """
    b, m, ww, _ = fine_conf.shape
    r = window // 2
    flat = fine_conf.reshape(b, m, ww * ww)
    am = flat.argmax(axis=-1)                               # global argmax
    i_win = am // ww
    j_win = am % ww
    best = jnp.take_along_axis(flat, am[..., None], axis=-1)[..., 0]
    # mutual-NN at the argmax: it is automatically the max of its row and of
    # its column (it is the global max), so the reference's mutual mask passes
    # exactly when the argmax cell clears the threshold.
    gate = best > thr

    centers0 = match_coords(matches.i_ids, grid_w0, coarse_scale)  # px
    centers1 = match_coords(matches.j_ids, grid_w1, coarse_scale)
    off0 = jnp.stack([i_win % window - r, i_win // window - r], -1)
    off1 = jnp.stack([j_win % window - r, j_win // window - r], -1)
    mkpts0 = centers0 + off0.astype(jnp.float32) * fine_scale
    mkpts1 = centers1 + off1.astype(jnp.float32) * fine_scale

    valid = matches.valid & gate
    mconf = jnp.where(valid, best, 0.0)
    return FineMatches(fine_conf, mkpts0, mkpts1, mconf, valid)
