"""Streaming (chunked) dual-softmax coarse loss.

Computes GeoLoss's coarse focal/CE terms directly from the transformer
features, never materializing the [B, L, S] confidence matrix in HBM. The
reference consumes a dense conf matrix (model/loftr_src/losses/
loftr_loss.py:246-296) built by CoarseMatching.forward
(loftr/utils/coarse_matching.py:110-127); at 640px that is a
[B, 4800, 4800] float tensor per pass (x2 passes, plus a dense one-hot GT),
which dominated round-1 training time via HBM traffic.

Key identity: with sim_ij = <f0_i, f1_j> / (C * T) (both features divided by
sqrt(C), temperature T — exactly ops.matching.dual_softmax),

    conf_ij = softmax_row(sim)_ij * softmax_col(sim)_ij
            = exp(2*sim_ij - r_i - c_j),
    r_i = logsumexp_j sim_ij,   c_j = logsumexp_i sim_ij.

So any elementwise loss over conf needs only (a) the two LSE vectors — one
streamed pass over sim tiles — and (b) for the positive (GT-slot) term, a
single gathered dot product per row. A lax.scan over row chunks with
jax.checkpoint keeps peak memory at one [B, chunk, S] tile; the backward
recomputes tiles instead of storing them. The tile matmul is MXU-shaped
([chunk, C] x [C, S]), so the recompute cost is a few extra GFLOPs, not a
bandwidth bill.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from geoformer_tpu.config import LossConfig

_NEG_INF = -1e9  # matches ops.matching.dual_softmax's mask fill


def _prep(feat0: jax.Array, feat1: jax.Array, temperature: float,
          mask0: Optional[jax.Array], mask1: Optional[jax.Array],
          chunk: int):
    """Pad the row axis to a chunk multiple and build the effective row/col
    validity vectors (padding rows count as invalid). Features keep their
    input dtype: the tile matmuls run bf16xbf16->f32 on the MXU when the
    model is bf16 (4x the f32 contraction rate; the 1/(C*T) scale is applied
    to the f32 tile, so no bf16 rounding is introduced beyond the features
    themselves), and stay exactly f32 in f32 mode."""
    b, l, c = feat0.shape
    s = feat1.shape[1]
    inv = 1.0 / (float(c) * temperature)
    f0 = feat0
    f1 = feat1

    row_valid = jnp.ones((b, l), bool) if mask0 is None \
        else mask0.reshape(b, l) > 0
    col_valid = None if mask1 is None else mask1.reshape(b, s) > 0

    pad = (-l) % chunk
    if pad:
        f0 = jnp.pad(f0, ((0, 0), (0, pad), (0, 0)))
        row_valid = jnp.pad(row_valid, ((0, 0), (0, pad)))
    return f0, f1, row_valid, col_valid, pad, inv


def _tile(f0c: jax.Array, f1: jax.Array, rv: jax.Array,
          col_valid: Optional[jax.Array], inv: float) -> jax.Array:
    """One [B, chunk, S] masked similarity tile, accumulated in f32."""
    t = jnp.einsum("blc,bsc->bls", f0c, f1,
                   preferred_element_type=jnp.float32) * inv
    valid = rv[:, :, None]
    if col_valid is not None:
        valid = valid & col_valid[:, None, :]
    return jnp.where(valid, t, _NEG_INF)


def sim_lse(feat0: jax.Array, feat1: jax.Array, temperature: float,
            mask0: Optional[jax.Array] = None,
            mask1: Optional[jax.Array] = None,
            chunk: int = 600,
            axis_name: Optional[str] = None) -> Tuple[jax.Array, jax.Array]:
    """Row/col logsumexp of the masked similarity matrix, streamed.

    Returns (r [B, L], c [B, S]) in f32. Invalid rows/cols see the -1e9
    plateau, matching the dense dual_softmax exactly.

    axis_name: when set (inside shard_map, sequence-parallel path), feat0
    holds only this device's rows while feat1/mask1 are global; the column
    LSE is merged across the mesh axis with an online-logsumexp psum, and
    the returned r covers only the local rows.
    """
    b, l, _ = feat0.shape
    s = feat1.shape[1]
    chunk = max(1, min(chunk, l))
    f0, f1, row_valid, col_valid, _, inv = _prep(
        feat0, feat1, temperature, mask0, mask1, chunk)
    n = f0.shape[1] // chunk
    f0_ch = f0.reshape(b, n, chunk, -1).transpose(1, 0, 2, 3)
    rv_ch = row_valid.reshape(b, n, chunk).transpose(1, 0, 2)

    def body(carry, xs):
        m, acc = carry                       # online col-LSE state [B, S]
        f0c, rv = xs
        t = _tile(f0c, f1, rv, col_valid, inv)
        r_c = jax.nn.logsumexp(t, axis=2)    # [B, chunk]
        m_new = jnp.maximum(m, t.max(axis=1))
        acc = acc * jnp.exp(m - m_new) + jnp.exp(
            t - m_new[:, None, :]).sum(axis=1)
        return (m_new, acc), r_c

    init = (jnp.full((b, s), _NEG_INF, jnp.float32),
            jnp.zeros((b, s), jnp.float32))
    if axis_name is not None:
        # shard_map vma typing: the carry becomes device-varying in the body.
        init = jax.tree.map(
            lambda x: lax.pcast(x, (axis_name,), to="varying"), init)
    (m, acc), r_ch = lax.scan(jax.checkpoint(body), init, (f0_ch, rv_ch))
    r = r_ch.transpose(1, 0, 2).reshape(b, -1)[:, :l]
    if axis_name is not None:
        # Cross-device online-LSE merge of the column statistics: the local
        # (m, acc) pairs summarize this device's row shard only. The max
        # shift is gradient-neutral (cancels in c = m + log(acc)), and pmax
        # has no differentiation rule — detach it.
        gm = lax.pmax(lax.stop_gradient(m), axis_name)
        acc = lax.psum(acc * jnp.exp(m - gm), axis_name)
        m = gm
    c = m + jnp.log(jnp.maximum(acc, 1e-30))
    return r, c


def streaming_match_extract(feat0: jax.Array, feat1: jax.Array,
                            temperature: float,
                            mask0: Optional[jax.Array] = None,
                            mask1: Optional[jax.Array] = None,
                            chunk: int = 600,
                            axis_name: Optional[str] = None):
    """Row/col nearest-neighbour statistics of the dual-softmax confidence,
    streamed — the extraction-side complement of streaming_coarse_loss.

    With conf_ij = exp(2 sim_ij - r_i - c_j) (module docstring identity),
    the row argmax of conf is argmax_j (2 sim_ij - c_j) and the col argmax
    is argmax_i (2 sim_ij - r_i): match extraction needs one streamed pass
    for the LSE vectors and one for the arg/max stats, never a [B, L, S]
    tensor (the reference materializes the full conf matrix for this,
    loftr/utils/coarse_matching.py:110-190).

    Returns:
        row_best: [B, L] f32 best confidence per image0 cell.
        j_ids:    [B, L] int32 argmax column per row.
        col_arg:  [B, S] int32 argmax row per column.
        conf00:   [B] f32 confidence at cell pair (0, 0) (force-one support).

    axis_name: sequence-parallel mode (inside shard_map): feat0/mask0 hold
    only this device's contiguous row shard, feat1/mask1 this device's
    column shard. feat1 is all-gathered on entry (tokens x C — megabytes,
    not the [L, S] matrix), row stats stay shard-local with *global* row
    indices, and column max/argmax are merged across the mesh axis with the
    same first-wins tie rule as the chunk scan. j_ids/row_best come back
    for the local rows; col_arg/conf00 are replicated.
    """
    b, l, _ = feat0.shape
    row_off = jnp.int32(0)
    if axis_name is not None:
        row_off = (lax.axis_index(axis_name) * l).astype(jnp.int32)
        feat1 = lax.all_gather(feat1, axis_name, axis=1, tiled=True)
        if mask1 is not None:
            mask1 = lax.all_gather(mask1.reshape(b, -1), axis_name, axis=1,
                                   tiled=True)
    s = feat1.shape[1]
    chunk = max(1, min(chunk, l))
    r, c = sim_lse(feat0, feat1, temperature, mask0, mask1, chunk,
                   axis_name=axis_name)
    f0, f1, row_valid, col_valid, pad, inv = _prep(
        feat0, feat1, temperature, mask0, mask1, chunk)
    n = f0.shape[1] // chunk
    f0_ch = f0.reshape(b, n, chunk, -1).transpose(1, 0, 2, 3)
    rv_ch = row_valid.reshape(b, n, chunk).transpose(1, 0, 2)
    r_ch = jnp.pad(r, ((0, 0), (0, pad))).reshape(b, n, chunk) \
        .transpose(1, 0, 2)
    starts = row_off + jnp.arange(n, dtype=jnp.int32) * chunk

    def body(carry, xs):
        col_m, col_a = carry                     # running col max/arg [B, S]
        f0c, rv, r_c, start = xs
        t = _tile(f0c, f1, rv, col_valid, inv)   # [B, chunk, S] sim
        z_row = 2.0 * t - c[:, None, :]
        m = z_row.max(axis=2)
        a = z_row.argmax(axis=2).astype(jnp.int32)
        row_best = jnp.exp(m - r_c)
        z_col = 2.0 * t - r_c[:, :, None]
        cm = z_col.max(axis=1)                   # [B, S]
        ca = (start + z_col.argmax(axis=1)).astype(jnp.int32)
        better = cm > col_m
        return (jnp.where(better, cm, col_m),
                jnp.where(better, ca, col_a)), (row_best, a)

    init = (jnp.full((b, s), -jnp.inf, jnp.float32),
            jnp.zeros((b, s), jnp.int32))
    if axis_name is not None:
        init = jax.tree.map(
            lambda x: lax.pcast(x, (axis_name,), to="varying"), init)
    (col_m, col_arg), (rb_ch, a_ch) = lax.scan(
        body, init, (f0_ch, rv_ch, r_ch, starts))
    if axis_name is not None:
        # Column argmax across row shards. The chunk scan keeps the FIRST
        # (lowest row index) maximizer on value ties; across devices the
        # same rule is min(global row index) among the max achievers.
        gm = lax.pmax(col_m, axis_name)
        cand = jnp.where(col_m >= gm, col_arg, jnp.iinfo(jnp.int32).max)
        col_arg = lax.pmin(cand, axis_name)
    row_best = rb_ch.transpose(1, 0, 2).reshape(b, -1)[:, :l]
    j_ids = a_ch.transpose(1, 0, 2).reshape(b, -1)[:, :l]

    sim00 = jnp.einsum("bc,bc->b", f0[:, 0], f1[:, 0],
                       preferred_element_type=jnp.float32) * inv
    if mask0 is not None or mask1 is not None:
        ok00 = row_valid[:, 0]
        if col_valid is not None:
            ok00 = ok00 & col_valid[:, 0]
        sim00 = jnp.where(ok00, sim00, _NEG_INF)
    conf00 = jnp.exp(2.0 * sim00 - r[:, 0] - c[:, 0])
    if axis_name is not None:
        # Only the shard owning global row 0 holds the true (0, 0) cell.
        conf00 = lax.psum(
            jnp.where(lax.axis_index(axis_name) == 0, conf00, 0.0), axis_name)
    return row_best, j_ids, col_arg, conf00


def _focal_pos(p, alpha, gamma):
    return -alpha * (1 - p) ** gamma * jnp.log(p)


def _focal_neg(p, alpha, gamma):
    return -alpha * p ** gamma * jnp.log(1 - p)


def streaming_coarse_loss(
    feat0: jax.Array,
    feat1: jax.Array,
    gt_j: jax.Array,
    gt_valid: jax.Array,
    cfg: LossConfig,
    temperature: float = 0.1,
    mask0: Optional[jax.Array] = None,
    mask1: Optional[jax.Array] = None,
    chunk: int = 600,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Coarse GeoLoss term from features + sparse GT, streamed.

    Numerically equivalent (values and gradients) to
    train.loss.coarse_loss(dual_softmax(feat0, feat1, T, m0, m1), one_hot(gt))
    — verified by tests/test_fused_loss.py — but with O(B*chunk*S) peak
    memory instead of O(B*L*S).

    Args:
        feat0/feat1: [B, L, C] / [B, S, C] post-transformer coarse features.
        gt_j: [B, L] GT column per image0 cell (sparse one-hot row form).
        gt_valid: [B, L] rows that carry a GT match.
        axis_name: sequence-parallel mode (inside shard_map): feat0 / gt_j /
            gt_valid / mask0 hold this device's row shard, feat1 / mask1 its
            column shard (gathered here); losses reduce with global psum'd
            numerators and counts, so values AND gradients match the
            replicated computation.
    """
    b, l, cdim = feat0.shape
    if axis_name is not None:
        feat1 = lax.all_gather(feat1, axis_name, axis=1, tiled=True)
        if mask1 is not None:
            mask1 = lax.all_gather(mask1.reshape(b, -1), axis_name, axis=1,
                                   tiled=True)
    s = feat1.shape[1]
    chunk = max(1, min(chunk, l))
    r, c = sim_lse(feat0, feat1, temperature, mask0, mask1, chunk,
                   axis_name=axis_name)

    # effective per-cell weight of the dense path: weight = mask0 x mask1
    row_valid = jnp.ones((b, l), bool) if mask0 is None \
        else mask0.reshape(b, l) > 0
    col_valid = jnp.ones((b, s), bool) if mask1 is None \
        else mask1.reshape(b, s) > 0

    # ---- positive term: gathered dot products, no tiles needed -------------
    inv = 1.0 / (float(cdim) * temperature)
    f1_gt = jnp.take_along_axis(
        feat1.astype(jnp.float32), gt_j[..., None], axis=1)   # [B, L, C]
    sim_pos = (feat0.astype(jnp.float32) * f1_gt).sum(-1) * inv
    gt_col_ok = jnp.take_along_axis(col_valid, gt_j, axis=1)
    cell_ok = row_valid & gt_col_ok
    sim_pos = jnp.where(cell_ok, sim_pos, _NEG_INF)           # dense-path fill
    logp = 2.0 * sim_pos - r - jnp.take_along_axis(c, gt_j, axis=1)
    p_pos = jnp.clip(jnp.exp(logp), 1e-6, 1 - 1e-6)
    pos_mask = gt_valid & cell_ok

    if cfg.coarse_type == "cross_entropy":
        lp = -jnp.log(p_pos)
    else:
        lp = _focal_pos(p_pos, cfg.focal_alpha, cfg.focal_gamma)
    w = pos_mask.astype(jnp.float32)
    pos_sum, pos_cnt = (lp * w).sum(), w.sum()
    if axis_name is not None:
        pos_sum = lax.psum(pos_sum, axis_name)
        pos_cnt = lax.psum(pos_cnt, axis_name)
    pos_loss = pos_sum / jnp.maximum(pos_cnt, 1.0)

    if cfg.coarse_type == "focal" and cfg.sparse_spvs:
        return cfg.pos_weight * pos_loss

    # ---- negative term: second streamed pass over tiles --------------------
    f0, f1, row_valid_p, col_valid_p, _, inv = _prep(
        feat0, feat1, temperature, mask0, mask1, chunk)
    n = f0.shape[1] // chunk
    f0_ch = f0.reshape(b, n, chunk, -1).transpose(1, 0, 2, 3)
    rv_ch = row_valid_p.reshape(b, n, chunk).transpose(1, 0, 2)
    r_pad = jnp.pad(r, ((0, 0), (0, f0.shape[1] - l)))
    r_ch = r_pad.reshape(b, n, chunk).transpose(1, 0, 2)
    gt_j_pad = jnp.pad(gt_j, ((0, 0), (0, f0.shape[1] - l)))
    gtv_pad = jnp.pad(gt_valid, ((0, 0), (0, f0.shape[1] - l)))
    gtj_ch = gt_j_pad.reshape(b, n, chunk).transpose(1, 0, 2)
    gtv_ch = gtv_pad.reshape(b, n, chunk).transpose(1, 0, 2)

    neg = cfg.coarse_type != "cross_entropy"
    col_ids = jnp.arange(s)

    def body(acc, xs):
        loss_sum, cnt = acc
        f0c, rv, rc, gj, gv = xs
        t = _tile(f0c, f1, rv, col_valid_p, inv)              # [B, chunk, S]
        p = jnp.clip(jnp.exp(2.0 * t - rc[:, :, None] - c[:, None, :]),
                     1e-6, 1 - 1e-6)
        is_gt = gv[:, :, None] & (gj[:, :, None] == col_ids[None, None, :])
        wmask = rv[:, :, None]
        if col_valid_p is not None:
            wmask = wmask & col_valid_p[:, None, :]
        nmask = (wmask & ~is_gt).astype(jnp.float32)
        ln = _focal_neg(p, cfg.focal_alpha, cfg.focal_gamma) if neg \
            else -jnp.log(1 - p)
        return (loss_sum + (ln * nmask).sum(),
                cnt + nmask.sum()), None

    init = (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
    if axis_name is not None:
        init = jax.tree.map(
            lambda x: lax.pcast(x, (axis_name,), to="varying"), init)
    (ln_sum, ln_cnt), _ = lax.scan(
        jax.checkpoint(body), init, (f0_ch, rv_ch, r_ch, gtj_ch, gtv_ch))
    if axis_name is not None:
        ln_sum = lax.psum(ln_sum, axis_name)
        ln_cnt = lax.psum(ln_cnt, axis_name)
    neg_loss = ln_sum / jnp.maximum(ln_cnt, 1.0)
    return cfg.pos_weight * pos_loss + cfg.neg_weight * neg_loss
