"""Pallas TPU kernels for the attention hot paths.

masked_kv_attention: the GAM self-layer pattern — L query tokens attending to
a fixed-capacity masked KV set (S <= ~1024). The full KV block fits VMEM, so
the kernel tiles queries and keeps logits entirely on-chip instead of
materializing the [L, S, H] tensor in HBM as the XLA path does
(reference semantics: model/geo_transformer/geo_attention.py:47-101).

Falls back to the jnp implementation on non-TPU backends.

Training support: a custom VJP with an IN-KERNEL backward — each query tile
recomputes its attention weights on-chip (flash-attention style, no
[L, S, H] residual or logits tensor ever hits HBM) and emits dq plus dk/dv
partial sums accumulated across the sequential TPU grid. Non-TPU backends
fall back to an equivalent jnp backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geoformer_tpu.ops.attention import full_attention


def _mka_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, nhead: int,
                mask_fill: float):
    """One (batch, query-tile) program: full softmax attention over the
    resident KV block with column masking."""
    hd = q_ref.shape[2]
    d = hd // nhead
    scale = 1.0 / (d ** 0.5)

    mask = mask_ref[0, 0, :] > 0                            # [S]
    for h in range(nhead):
        qh = q_ref[0, :, h * d:(h + 1) * d]                 # [TL, D]
        kh = k_ref[0, :, h * d:(h + 1) * d]                 # [S, D]
        vh = v_ref[0, :, h * d:(h + 1) * d]
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [TL, S]
        logits = jnp.where(mask[None, :], logits, mask_fill)
        attn = jax.nn.softmax(scale * logits, axis=1)
        o_ref[0, :, h * d:(h + 1) * d] = jnp.dot(
            attn, vh, preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def masked_kv_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                        kv_mask: jax.Array, mask_fill: float = -1e8,
                        tile: int = 512) -> jax.Array:
    """Flash-style masked-KV attention.

    Args:
        q: [B, L, H, D]; k, v: [B, S, H, D]; kv_mask: [B, S].
    Returns:
        [B, L, H, D], numerically matching
        full_attention(..., mask_fill=mask_fill).
    """
    return _mka_forward(q, k, v, kv_mask, mask_fill, tile)


def _mka_forward(q, k, v, kv_mask, mask_fill, tile, interpret=False):
    b, l, h, d = q.shape
    s = k.shape[1]
    # Largest divisor tile <= ``tile`` that keeps the sublane dim 8-aligned;
    # real model shapes (L=4800) are not powers of two, so min(tile, l)
    # alone would silently disqualify the kernel.
    tl = _divisor_tile(l, tile)
    on_tpu = jax.default_backend() == "tpu" or interpret
    if not on_tpu or tl == 0:
        return full_attention(q, k, v, kv_mask=kv_mask, mask_fill=mask_fill)

    qf = q.reshape(b, l, h * d)
    kf = k.reshape(b, s, h * d)
    vf = v.reshape(b, s, h * d)
    # [B, 1, S]: a rank-2 [B, S] operand would need a (1, S) block whose
    # sublane dim (1) neither divides 8 nor equals B — invalid for B > 1.
    maskf = kv_mask.astype(jnp.float32).reshape(b, 1, s)

    out = pl.pallas_call(
        functools.partial(_mka_kernel, nhead=h, mask_fill=mask_fill),
        grid=(b, l // tl),
        in_specs=[
            pl.BlockSpec((1, tl, h * d), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, h * d), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, h * d), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tl, h * d), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, h * d), jnp.float32),
        interpret=interpret,
    )(qf, kf, vf, maskf)
    return out.reshape(b, l, h, d)


def _mka_fwd(q, k, v, kv_mask, mask_fill, tile):
    out = _mka_forward(q, k, v, kv_mask, mask_fill, tile)
    return out, (q, k, v, kv_mask)


def _mka_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref,
                    dq_ref, dk_ref, dv_ref, *, nhead: int, mask_fill: float):
    """In-kernel flash-style backward: one (batch, query-tile) program
    recomputes the attention weights for its tile (no [L, S, H] residual in
    HBM) and produces dq for the tile plus dk/dv partial sums. The TPU grid
    is sequential, so accumulating into the same dk/dv block across
    query-tile steps is well-defined."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    hd = q_ref.shape[2]
    d = hd // nhead
    scale = 1.0 / (d ** 0.5)
    mask = mask_ref[0, 0, :] > 0                             # [S]
    for h in range(nhead):
        sl = slice(h * d, (h + 1) * d)
        qh = q_ref[0, :, sl]                                 # [TL, D]
        kh = k_ref[0, :, sl]                                 # [S, D]
        vh = v_ref[0, :, sl]
        gh = g_ref[0, :, sl]                                 # [TL, D]
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [TL, S]
        logits = jnp.where(mask[None, :], logits, mask_fill)
        attn = jax.nn.softmax(scale * logits, axis=1)

        dv_ref[0, :, sl] += jax.lax.dot_general(
            attn, gh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [S, D]
        d_attn = jax.lax.dot_general(
            gh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [TL, S]
        dot = jnp.sum(attn * d_attn, axis=1, keepdims=True)
        dl = attn * (d_attn - dot) * scale
        dl = jnp.where(mask[None, :], dl, 0.0)
        dq_ref[0, :, sl] = jnp.dot(dl, kh,
                                   preferred_element_type=jnp.float32)
        dk_ref[0, :, sl] += jax.lax.dot_general(
            dl, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _mka_bwd_pallas(q, k, v, kv_mask, g, mask_fill, tile,
                    interpret: bool = False):
    b, l, h, d = q.shape
    s = k.shape[1]
    tl = _divisor_tile(l, tile)
    qf = q.reshape(b, l, h * d)
    kf = k.reshape(b, s, h * d)
    vf = v.reshape(b, s, h * d)
    gf = g.reshape(b, l, h * d).astype(jnp.float32)
    maskf = kv_mask.astype(jnp.float32).reshape(b, 1, s)

    kv_spec = pl.BlockSpec((1, s, h * d), lambda bi, i: (bi, 0, 0),
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, tl, h * d), lambda bi, i: (bi, i, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_mka_bwd_kernel, nhead=h, mask_fill=mask_fill),
        grid=(b, l // tl),
        in_specs=[
            q_spec, kv_spec, kv_spec,
            pl.BlockSpec((1, 1, s), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            q_spec,
        ],
        out_specs=[q_spec, kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, h * d), jnp.float32),
            jax.ShapeDtypeStruct((b, s, h * d), jnp.float32),
            jax.ShapeDtypeStruct((b, s, h * d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, maskf, gf)
    return (dq.reshape(b, l, h, d).astype(q.dtype),
            dk.reshape(b, s, h, d).astype(k.dtype),
            dv.reshape(b, s, h, d).astype(v.dtype))


def _mka_bwd_jnp(q, k, v, kv_mask, g, mask_fill):
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, q.dtype))
    logits = jnp.einsum("blhd,bshd->blsh", q, k)
    keep = kv_mask[:, None, :, None].astype(bool)
    logits = jnp.where(keep, logits, mask_fill)
    attn = jax.nn.softmax(scale * logits, axis=2)

    dv = jnp.einsum("blsh,blhd->bshd", attn, g)
    d_attn = jnp.einsum("blhd,bshd->blsh", g, v)
    dot = jnp.sum(attn * d_attn, axis=2, keepdims=True)
    d_logits = attn * (d_attn - dot) * scale
    d_logits = jnp.where(keep, d_logits, 0.0)
    dq = jnp.einsum("blsh,bshd->blhd", d_logits, k)
    dk = jnp.einsum("blsh,blhd->bshd", d_logits, q)
    return dq, dk, dv


def _mka_bwd(mask_fill, tile, res, g):
    q, k, v, kv_mask = res
    l = q.shape[1]
    if jax.default_backend() == "tpu" and _divisor_tile(l, tile) != 0:
        dq, dk, dv = _mka_bwd_pallas(q, k, v, kv_mask, g, mask_fill, tile)
    else:
        dq, dk, dv = _mka_bwd_jnp(q, k, v, kv_mask, g, mask_fill)
    if jnp.issubdtype(kv_mask.dtype, jnp.bool_) or \
            jnp.issubdtype(kv_mask.dtype, jnp.integer):
        import numpy as _np

        dmask = _np.zeros(kv_mask.shape, dtype=jax.dtypes.float0)
    else:
        dmask = jnp.zeros(kv_mask.shape, kv_mask.dtype)
    return dq, dk, dv, dmask


masked_kv_attention.defvjp(_mka_fwd, _mka_bwd)


# --------------------------------------------------------------------------
# Box-window cross attention: the GAM cross-layer pattern without gathers.
#
# Each query token attends to the (2r+1)^2 window of destination cells
# around its homography-warped center. Gathering those windows costs
# [B, L, W^2, C] of HBM traffic (the round-1 hot spot, 183 ms/fwd at B=4);
# but the window around center (cx, cy) is exactly the box mask
# |sx - cx| <= r  &  |sy - cy| <= r over the full destination token set, so
# a kernel with the pre-projected K/V resident in VMEM needs no gather at
# all — the mask is computed on-chip from a [TL, 2] center tile, and the
# matmuls are MXU-shaped [TL, S] tiles.


def _box_mask(cx, cy, sx, sy, radius):
    return (jnp.abs(sx - cx) <= radius) & (jnp.abs(sy - cy) <= radius)


def _box_fwd_kernel(c_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                    nhead: int, radius: int, wd: int, mask_fill: float):
    """One (batch, query-tile) program; whole KV resident; also emits the
    per-row LSE of the scaled masked logits for the flash backward."""
    hd = q_ref.shape[2]
    d = hd // nhead
    scale = 1.0 / (d ** 0.5)
    s = k_ref.shape[1]
    cx = c_ref[0, :, 0][:, None]                             # [TL, 1]
    cy = c_ref[0, :, 1][:, None]
    sidx = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    box = _box_mask(cx, cy, sidx % wd, sidx // wd, radius)   # [TL, S]
    row_ok = box.any(axis=1, keepdims=True)                  # [TL, 1]
    for h in range(nhead):
        sl = slice(h * d, (h + 1) * d)
        logits = jax.lax.dot_general(
            q_ref[0, :, sl], k_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [TL, S]
        z = scale * jnp.where(box, logits, mask_fill)
        m = z.max(axis=1, keepdims=True)
        e = jnp.exp(z - m)
        denom = e.sum(axis=1, keepdims=True)
        lse_ref[0, :, h] = (m + jnp.log(denom))[:, 0]
        attn = (e / denom) * row_ok
        o_ref[0, :, sl] = jnp.dot(attn, v_ref[0, :, sl],
                                  preferred_element_type=jnp.float32)


def _box_fwd_tiled_kernel(c_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                          m_scr, d_scr, a_scr, *, nhead: int, radius: int,
                          wd: int, hd_grid: int, ts: int, n_s: int,
                          mask_fill: float):
    """Online-softmax (flash) forward over a (batch, q-tile, kv-tile) grid:
    K/V stream through VMEM in TS-sized tiles instead of residing whole, so
    the kernel fits f32 at S=4800 (whole-KV needs 19.1 MB there). Scratch
    carries the running max/denominator/weighted-V across kv tiles; output
    and LSE are written on the last tile. Numerics match _box_fwd_kernel."""
    si = pl.program_id(2)

    @pl.when(si == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        d_scr[...] = jnp.zeros_like(d_scr)
        a_scr[...] = jnp.zeros_like(a_scr)

    hd = q_ref.shape[2]
    d = hd // nhead
    scale = 1.0 / (d ** 0.5)
    cx = c_ref[0, :, 0][:, None]                             # [TL, 1]
    cy = c_ref[0, :, 1][:, None]

    # Box-sparsity skip: with radius=2 each query needs 25 of S keys, and
    # raster-ordered queries have spatially coherent warped centers, so most
    # kv tiles intersect NO query box in this tile. The tile covers dest
    # rows [si*ts//wd, (si*ts+ts-1)//wd]; skip the MXU work when the tile's
    # row span misses every query's [cy-r, cy+r] band (conservative on
    # partial first/last rows — correctness unaffected, masked entries
    # contribute exp(mask_fill) = 0 exactly as when executed).
    row_lo = si * ts // wd
    row_hi = (si * ts + ts - 1) // wd
    overlap = jnp.logical_and(jnp.max(cy) + radius >= row_lo,
                              jnp.min(cy) - radius <= row_hi)

    @pl.when(overlap)
    def _tile_work():
        sidx = si * ts + jax.lax.broadcasted_iota(jnp.int32, (1, ts), 1)
        box = _box_mask(cx, cy, sidx % wd, sidx // wd, radius)  # [TL, TS]
        for h in range(nhead):
            sl = slice(h * d, (h + 1) * d)
            logits = jax.lax.dot_general(
                q_ref[0, :, sl], k_ref[0, :, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [TL, TS]
            z = scale * jnp.where(box, logits, mask_fill)
            m_old = m_scr[:, h][:, None]
            m_new = jnp.maximum(m_old, z.max(axis=1, keepdims=True))
            corr = jnp.exp(m_old - m_new)
            e = jnp.exp(z - m_new)
            m_scr[:, h] = m_new[:, 0]
            d_scr[:, h] = d_scr[:, h] * corr[:, 0] + e.sum(axis=1)
            a_scr[:, sl] = a_scr[:, sl] * corr + jnp.dot(
                e, v_ref[0, :, sl], preferred_element_type=jnp.float32)

    @pl.when(si == n_s - 1)
    def _emit():
        # full-grid row validity, same formula as the backward kernel
        row_ok = ((cx + radius >= 0) & (cx - radius <= wd - 1)
                  & (cy + radius >= 0) & (cy - radius <= hd_grid - 1))
        for h in range(nhead):
            sl = slice(h * d, (h + 1) * d)
            denom = d_scr[:, h][:, None]
            safe = jnp.maximum(denom, 1e-30)
            o_ref[0, :, sl] = jnp.where(
                row_ok, a_scr[:, sl] / safe, 0.0)
            # rows whose every kv tile was skipped (box fully off-grid)
            # report the same LSE the whole-KV kernel computes for them:
            # all-masked logits give m = scale*mask_fill, denom = S
            lse_ref[0, :, h] = jnp.where(
                denom[:, 0] > 0,
                m_scr[:, h] + jnp.log(safe[:, 0]),
                scale * mask_fill + jnp.log(jnp.float32(n_s * ts)))


def _box_bwd_dkv_kernel(c_ref, q_ref, k_ref, v_ref, g_ref, lse_ref,
                        delta_ref, dk_ref, dv_ref, *, nhead: int,
                        radius: int, wd: int, hd_grid: int, ts: int,
                        mask_fill: float):
    """dk/dv half of the flash backward, grid (batch, kv-tile, query-tile):
    attention is recomputed blockwise from the saved LSE and dk/dv accumulate
    across query tiles. The accumulated (kv-tile) output block is revisited
    on CONSECUTIVE grid steps because the query tile is the innermost grid
    dimension — Pallas TPU only keeps an output block resident across
    consecutive steps, which is why dq (accumulated across kv tiles) lives in
    its own kernel with the transposed grid instead of a third output here.
    All blocks are small (TL/TS x head_dim)."""
    st = pl.program_id(1)
    lt = pl.program_id(2)

    @pl.when(lt == 0)
    def _init_kv():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    hd = q_ref.shape[2]
    d = hd // nhead
    scale = 1.0 / (d ** 0.5)
    cx = c_ref[0, :, 0][:, None]
    cy = c_ref[0, :, 1][:, None]

    # Same box-sparsity skip as the tiled forward: if this kv tile's dest-row
    # span misses every query's [cy-r, cy+r] band, every attn entry is 0 and
    # all four matmuls contribute nothing — skip them.
    row_lo = st * ts // wd
    row_hi = (st * ts + ts - 1) // wd
    overlap = jnp.logical_and(jnp.max(cy) + radius >= row_lo,
                              jnp.min(cy) - radius <= row_hi)

    @pl.when(overlap)
    def _tile_work():
        sidx = st * ts + jax.lax.broadcasted_iota(jnp.int32, (1, ts), 1)
        box = _box_mask(cx, cy, sidx % wd, sidx // wd, radius)  # [TL, TS]
        # row validity over the FULL grid (not just this tile): matches the
        # forward's zero-empty-rows semantics
        row_ok = ((cx + radius >= 0) & (cx - radius <= wd - 1)
                  & (cy + radius >= 0) & (cy - radius <= hd_grid - 1))
        for h in range(nhead):
            sl = slice(h * d, (h + 1) * d)
            qh = q_ref[0, :, sl]                             # [TL, D]
            kh = k_ref[0, :, sl]                             # [TS, D]
            vh = v_ref[0, :, sl]
            gh = g_ref[0, :, sl]
            logits = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [TL, TS]
            lse = lse_ref[0, :, h][:, None]
            attn = jnp.where(box & row_ok,
                             jnp.exp(scale * logits - lse), 0.0)
            dv_ref[0, :, sl] += jax.lax.dot_general(
                attn, gh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            d_attn = jax.lax.dot_general(
                gh, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            delta = delta_ref[0, :, h][:, None]
            dl = attn * (d_attn - delta) * scale
            dk_ref[0, :, sl] += jax.lax.dot_general(
                dl, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def _box_bwd_dq_kernel(c_ref, q_ref, k_ref, v_ref, g_ref, lse_ref,
                       delta_ref, dq_ref, *, nhead: int, radius: int,
                       wd: int, hd_grid: int, ts: int, mask_fill: float):
    """dq half of the flash backward, grid (batch, query-tile, kv-tile): the
    kv tile is the innermost grid dimension so the accumulated dq block is
    revisited on consecutive steps (see _box_bwd_dkv_kernel's docstring for
    why the two halves need transposed grids)."""
    st = pl.program_id(2)

    @pl.when(st == 0)
    def _init_q():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    hd = q_ref.shape[2]
    d = hd // nhead
    scale = 1.0 / (d ** 0.5)
    cx = c_ref[0, :, 0][:, None]
    cy = c_ref[0, :, 1][:, None]

    row_lo = st * ts // wd
    row_hi = (st * ts + ts - 1) // wd
    overlap = jnp.logical_and(jnp.max(cy) + radius >= row_lo,
                              jnp.min(cy) - radius <= row_hi)

    @pl.when(overlap)
    def _tile_work():
        sidx = st * ts + jax.lax.broadcasted_iota(jnp.int32, (1, ts), 1)
        box = _box_mask(cx, cy, sidx % wd, sidx // wd, radius)  # [TL, TS]
        row_ok = ((cx + radius >= 0) & (cx - radius <= wd - 1)
                  & (cy + radius >= 0) & (cy - radius <= hd_grid - 1))
        for h in range(nhead):
            sl = slice(h * d, (h + 1) * d)
            qh = q_ref[0, :, sl]                             # [TL, D]
            kh = k_ref[0, :, sl]                             # [TS, D]
            vh = v_ref[0, :, sl]
            gh = g_ref[0, :, sl]
            logits = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [TL, TS]
            lse = lse_ref[0, :, h][:, None]
            attn = jnp.where(box & row_ok,
                             jnp.exp(scale * logits - lse), 0.0)
            d_attn = jax.lax.dot_general(
                gh, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            delta = delta_ref[0, :, h][:, None]
            dl = attn * (d_attn - delta) * scale
            dq_ref[0, :, sl] += jnp.dot(dl, kh,
                                        preferred_element_type=jnp.float32)


def box_attention_reference(q, k, v, centers, grid_hw, radius,
                            mask_fill=-1e8):
    """jnp reference: materializes [B, L, S, H] — fallback/tests only.
    Numerically identical to gathering the (2r+1)^2 window per query and
    calling window_cross_attention (ops/attention.py:95-126)."""
    hd_grid, wd = grid_hw
    s = k.shape[1]
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    sidx = jnp.arange(s, dtype=jnp.int32)
    box = ((jnp.abs(sidx[None, None, :] % wd - centers[..., 0:1]) <= radius)
           & (jnp.abs(sidx[None, None, :] // wd - centers[..., 1:2])
              <= radius))                                    # [B, L, S]
    logits = jnp.einsum("blhd,bshd->blsh", q.astype(jnp.float32),
                        k.astype(jnp.float32))
    logits = jnp.where(box[..., None], logits, mask_fill)
    attn = jax.nn.softmax(scale * logits, axis=2)
    out = jnp.einsum("blsh,bshd->blhd", attn, v.astype(jnp.float32))
    row_ok = box.any(axis=2)
    return jnp.where(row_ok[..., None, None], out, 0.0).astype(q.dtype)


def _divisor_tile(n: int, target: int, step: int = 8) -> int:
    """Largest divisor of n that is <= target and a multiple of ``step``."""
    for t in range(min(target, n), step - 1, -1):
        if n % t == 0 and t % step == 0:
            return t
    return 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def box_window_attention(q, k, v, centers, grid_hw, radius: int = 2,
                         mask_fill: float = -1e8, q_tile: int = 120,
                         kv_tile: int = 480):
    """Gather-free GAM cross attention.

    Args:
        q: [B, L, H, D] queries; k, v: [B, S, H, D] pre-projected dest
            tokens (S = grid_hw[0] * grid_hw[1]).
        centers: [B, L, 2] int32 (cx, cy) warped query centers in dest cell
            coords (out-of-grid values allowed; fully out-of-box rows get a
            zero output, matching geo_attention.py:98-100).
    """
    return _box_forward(q, k, v, centers, grid_hw, radius, mask_fill,
                        q_tile, kv_tile)[0]


def _box_forward(q, k, v, centers, grid_hw, radius, mask_fill, q_tile,
                 kv_tile, interpret=False, force_tiled=None):
    b, l, h, d = q.shape
    s = k.shape[1]
    tl = _divisor_tile(l, q_tile)
    on_tpu = jax.default_backend() == "tpu" or interpret
    if not on_tpu or tl == 0:
        return box_attention_reference(q, k, v, centers, grid_hw, radius,
                                       mask_fill), None

    qf = q.reshape(b, l, h * d)
    kf = k.reshape(b, s, h * d)
    vf = v.reshape(b, s, h * d)

    # The whole-KV kernel keeps K+V resident plus two [TL, S] f32
    # temporaries per head iteration; beyond ~12 MB estimated (f32 at
    # S=4800 measures 19.1 MB > the 16 MB core limit) switch to the
    # kv-tiled online-softmax variant, which fits any resolution.
    itemsize = jnp.dtype(q.dtype).itemsize
    vmem_est = 2 * s * h * d * itemsize + 2 * tl * s * 4
    ts = _divisor_tile(s, kv_tile)
    if force_tiled is None:
        # Default since the round-3 A/B (RESULTS.md): kv-tiled online
        # softmax with box-sparsity tile skipping is ~17% faster than
        # whole-KV on the GAM's raster-coherent warped centers (10.2 vs
        # 12.3 ms at B=4 S=4800 bf16) and fits any resolution. Whole-KV
        # wins only on adversarial random centers (every kv tile
        # overlapping some query box), which homography-fitted centers
        # never produce; it stays reachable with force_tiled=False.
        use_tiled = ts != 0
    else:
        use_tiled = (force_tiled or vmem_est > 12 * 2 ** 20) and ts != 0
    if use_tiled:
        n_s = s // ts
        out, lse = pl.pallas_call(
            functools.partial(_box_fwd_tiled_kernel, nhead=h, radius=radius,
                              wd=grid_hw[1], hd_grid=grid_hw[0], ts=ts,
                              n_s=n_s, mask_fill=mask_fill),
            grid=(b, l // tl, n_s),
            in_specs=[
                pl.BlockSpec((1, tl, 2), lambda bi, li, si: (bi, li, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tl, h * d), lambda bi, li, si: (bi, li, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ts, h * d), lambda bi, li, si: (bi, si, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ts, h * d), lambda bi, li, si: (bi, si, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tl, h * d), lambda bi, li, si: (bi, li, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tl, h), lambda bi, li, si: (bi, li, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, l, h * d), jnp.float32),
                jax.ShapeDtypeStruct((b, l, h), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((tl, h), jnp.float32),
                pltpu.VMEM((tl, h), jnp.float32),
                pltpu.VMEM((tl, h * d), jnp.float32),
            ],
            interpret=interpret,
        )(centers, qf, kf, vf)
        return out.reshape(b, l, h, d).astype(q.dtype), lse

    out, lse = pl.pallas_call(
        functools.partial(_box_fwd_kernel, nhead=h, radius=radius,
                          wd=grid_hw[1], mask_fill=mask_fill),
        grid=(b, l // tl),
        in_specs=[
            pl.BlockSpec((1, tl, 2), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tl, h * d), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, h * d), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, h * d), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tl, h * d), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tl, h), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, h * d), jnp.float32),
            jax.ShapeDtypeStruct((b, l, h), jnp.float32),
        ],
        interpret=interpret,
    )(centers, qf, kf, vf)
    return out.reshape(b, l, h, d).astype(q.dtype), lse


def _box_fwd(q, k, v, centers, grid_hw, radius, mask_fill, q_tile, kv_tile):
    out, lse = _box_forward(q, k, v, centers, grid_hw, radius, mask_fill,
                            q_tile, kv_tile)
    return out, (q, k, v, centers, out, lse)


def _box_bwd_pallas(q, k, v, centers, g, out, lse, grid_hw, radius,
                    mask_fill, q_tile, kv_tile, interpret=False):
    b, l, h, d = q.shape
    s = k.shape[1]
    tl = _divisor_tile(l, q_tile)
    ts = _divisor_tile(s, kv_tile)
    if tl == 0 or ts == 0:
        return None
    delta = jnp.einsum("blhd,blhd->blh", g.astype(jnp.float32),
                       out.astype(jnp.float32))
    qf = q.reshape(b, l, h * d)
    kf = k.reshape(b, s, h * d)
    vf = v.reshape(b, s, h * d)
    gf = g.reshape(b, l, h * d).astype(jnp.float32)

    # dk/dv: query tile innermost (accumulated kv blocks revisited
    # consecutively).
    q_spec = pl.BlockSpec((1, tl, h * d), lambda bi, si, li: (bi, li, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, ts, h * d), lambda bi, si, li: (bi, si, 0),
                           memory_space=pltpu.VMEM)
    lh_spec = pl.BlockSpec((1, tl, h), lambda bi, si, li: (bi, li, 0),
                           memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(
            _box_bwd_dkv_kernel, nhead=h, radius=radius, wd=grid_hw[1],
            hd_grid=grid_hw[0], ts=ts, mask_fill=mask_fill),
        grid=(b, s // ts, l // tl),
        in_specs=[
            pl.BlockSpec((1, tl, 2), lambda bi, si, li: (bi, li, 0),
                         memory_space=pltpu.VMEM),
            q_spec, kv_spec, kv_spec, q_spec, lh_spec, lh_spec,
        ],
        out_specs=[kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, h * d), jnp.float32),
            jax.ShapeDtypeStruct((b, s, h * d), jnp.float32),
        ],
        interpret=interpret,
    )(centers, qf, kf, vf, gf, lse, delta)

    # dq: kv tile innermost (accumulated q blocks revisited consecutively).
    q_spec2 = pl.BlockSpec((1, tl, h * d), lambda bi, li, si: (bi, li, 0),
                           memory_space=pltpu.VMEM)
    kv_spec2 = pl.BlockSpec((1, ts, h * d), lambda bi, li, si: (bi, si, 0),
                            memory_space=pltpu.VMEM)
    lh_spec2 = pl.BlockSpec((1, tl, h), lambda bi, li, si: (bi, li, 0),
                            memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_box_bwd_dq_kernel, nhead=h, radius=radius,
                          wd=grid_hw[1], hd_grid=grid_hw[0], ts=ts,
                          mask_fill=mask_fill),
        grid=(b, l // tl, s // ts),
        in_specs=[
            pl.BlockSpec((1, tl, 2), lambda bi, li, si: (bi, li, 0),
                         memory_space=pltpu.VMEM),
            q_spec2, kv_spec2, kv_spec2, q_spec2, lh_spec2, lh_spec2,
        ],
        out_specs=q_spec2,
        out_shape=jax.ShapeDtypeStruct((b, l, h * d), jnp.float32),
        interpret=interpret,
    )(centers, qf, kf, vf, gf, lse, delta)
    return (dq.reshape(b, l, h, d).astype(q.dtype),
            dk.reshape(b, s, h, d).astype(k.dtype),
            dv.reshape(b, s, h, d).astype(v.dtype))


def _box_bwd(grid_hw, radius, mask_fill, q_tile, kv_tile, res, g):
    q, k, v, centers, out, lse = res
    import numpy as _np

    dcenters = _np.zeros(centers.shape, dtype=jax.dtypes.float0)
    if lse is not None and (jax.default_backend() == "tpu"):
        got = _box_bwd_pallas(q, k, v, centers, g, out, lse, grid_hw,
                              radius, mask_fill, q_tile, kv_tile)
        if got is not None:
            return (*got, dcenters)
    # reference backward via jax.vjp on the jnp path (small shapes only)
    _, vjp = jax.vjp(
        lambda a, b_, c: box_attention_reference(a, b_, c, centers, grid_hw,
                                                 radius, mask_fill), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, dcenters


box_window_attention.defvjp(_box_fwd, _box_bwd)
