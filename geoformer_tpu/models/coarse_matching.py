"""Coarse dual-softmax matching with fixed-capacity match extraction.

Functional re-derivation of CoarseMatching (reference:
model/loftr_src/loftr/utils/coarse_matching.py:90-212). The reference emits a
data-dependent match list via torch.where; here every image0 coarse cell keeps
a dense slot (j index, confidence, validity), and an optional top-k pass
compacts them to a static capacity. Note the reference constructor overrides
border_rm to 0, so no border suppression is applied.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from geoformer_tpu.core.capacity import topk_select
from geoformer_tpu.ops.matching import dual_softmax


class CoarseMatches(NamedTuple):
    """Fixed-shape coarse match set.

    conf: [B, L0, L1] dual-softmax confidence (differentiable, for the loss).
    i_ids/j_ids: [B, M] coarse cell indices into image0/image1 grids.
    valid: [B, M] slot validity.
    mconf: [B, M] confidence at (i, j).
    """

    conf: jax.Array
    i_ids: jax.Array
    j_ids: jax.Array
    valid: jax.Array
    mconf: jax.Array


def extract_matches(conf: jax.Array, thr: float, capacity: int,
                    force_one: bool = False, mask0=None, mask1=None
                    ) -> CoarseMatches:
    """Mutual-NN + threshold match extraction at fixed capacity.

    Mirrors get_coarse_match (coarse_matching.py:170-190): threshold, mutual
    nearest neighbour in both directions, and (training only) the force-one
    hack that guarantees >=1 match per pair by asserting cell (0, 0).

    capacity <= 0 selects "dense" mode: one slot per image0 cell (i_ids is the
    identity), which preserves the reference's row ordering exactly.
    """
    b, l0, l1 = conf.shape
    # Match extraction is a hard decision (@no_grad in the reference,
    # coarse_matching.py:132); only the conf matrix itself carries gradients.
    conf_sg = jax.lax.stop_gradient(conf)
    return CoarseMatches(conf, *_extract_ids(conf_sg, thr, capacity,
                                             force_one, mask0, mask1))


def _extract_ids(conf, thr, capacity, force_one, mask0, mask1):
    b, l0, l1 = conf.shape
    row_best = conf.max(axis=2)
    j_ids = conf.argmax(axis=2)                            # [B, L0]
    col_best = conf.max(axis=1)                            # [B, L1]
    mutual = row_best == jnp.take_along_axis(col_best, j_ids, axis=1)
    return _finalize_ids(row_best, j_ids, mutual, conf[:, 0, 0], l1, thr,
                         capacity, force_one, mask0, mask1)


def _finalize_ids(row_best, j_ids, mutual, conf00, l1, thr, capacity,
                  force_one, mask0, mask1):
    """Shared tail of match extraction: thresholding, padding-mask gating,
    the force-one hack and fixed-capacity top-k compaction."""
    b, l0 = row_best.shape
    valid = (row_best > thr) & mutual
    # Exclude padded cells outright. The reference only relies on their
    # near-zero confidence (they sit on the -INF plateau of the dual softmax),
    # which leaks matches when the padded region is tiny; masking is strictly
    # safer and changes nothing for unpadded inputs.
    if mask0 is not None:
        valid &= mask0.reshape(b, l0) > 0
    if mask1 is not None:
        valid &= jnp.take_along_axis(mask1.reshape(b, l1), j_ids, axis=1) > 0

    mconf = jnp.where(valid, row_best, 0.0)
    if force_one:
        none = ~valid.any(axis=1)                          # [B]
        forced = none[:, None] & (jnp.arange(l0) == 0)[None, :]
        valid = valid | forced
        j_ids = jnp.where(forced, 0, j_ids)
        # forced (0,0) slot keeps its true (possibly sub-threshold) confidence
        mconf = jnp.where(valid,
                          jnp.where(forced, conf00[:, None], row_best), 0.0)

    if capacity <= 0 or capacity >= l0:
        i_ids = jnp.broadcast_to(jnp.arange(l0, dtype=jnp.int32), (b, l0))
        return i_ids, j_ids.astype(jnp.int32), valid, mconf

    def select(mc, v, j):
        idx, ok = topk_select(mc, v, capacity)
        return idx, jnp.take(j, idx), ok, jnp.take(mc, idx) * ok

    i_ids, j_sel, ok, mc_sel = jax.vmap(select)(mconf, valid, j_ids)
    return i_ids.astype(jnp.int32), j_sel.astype(jnp.int32), ok, mc_sel


def coarse_match(
    feat_c0: jax.Array,
    feat_c1: jax.Array,
    thr: float,
    temperature: float = 0.1,
    capacity: int = -1,
    mask0: Optional[jax.Array] = None,
    mask1: Optional[jax.Array] = None,
    force_one: bool = False,
    streaming: bool = False,
    sp_axis: Optional[str] = None,
) -> CoarseMatches:
    """Full coarse matching: dual-softmax confidence + fixed-capacity
    extraction.

    streaming=True computes the extraction statistics in streamed row
    chunks (ops/fused_loss.streaming_match_extract) and never materializes
    the [B, L0, L1] confidence matrix; the returned ``conf`` field is a
    [B, 0, 0] placeholder (callers that need the dense matrix — the dense
    loss path, sinkhorn — must use streaming=False). Mutuality is checked
    on argmax indices instead of max values: mathematically identical,
    and robust to the different floating-point summation orders.

    sp_axis: sequence-parallel mesh axis (requires streaming=True and an
    ambient mesh): the extraction runs row-sharded under shard_map — each
    device streams only its own row chunks — with exact cross-device LSE /
    argmax merges (core/spmd.py design notes)."""
    if streaming:
        from geoformer_tpu.ops.fused_loss import streaming_match_extract

        b, l0, _ = feat_c0.shape
        # Extraction is a hard decision (@no_grad in the reference,
        # coarse_matching.py:132): sever gradients at the INPUTS so autodiff
        # never traces the extraction interior (whose cross-device pmax/pmin
        # merges have no differentiation rules).
        feat_c0 = jax.lax.stop_gradient(feat_c0)
        feat_c1 = jax.lax.stop_gradient(feat_c1)
        if sp_axis is not None:
            from jax.sharding import PartitionSpec as P

            l1 = feat_c1.shape[1]
            # Uniform specs need concrete mask arrays; all-ones masks are
            # mathematically identical to None in the extraction.
            m0 = jnp.ones((b, l0), bool) if mask0 is None \
                else mask0.reshape(b, l0)
            m1 = jnp.ones((b, l1), bool) if mask1 is None \
                else mask1.reshape(b, l1)
            # Only the seq axis is manualized (axis_names): on a 2-D
            # (data, seq) mesh the batch dim keeps its data sharding via
            # normal GSPMD propagation, so SP composes with DP eval.
            extracted = jax.shard_map(
                lambda f0, f1, a, bm: streaming_match_extract(
                    f0, f1, temperature, a, bm, axis_name=sp_axis),
                in_specs=(P(None, sp_axis, None), P(None, sp_axis, None),
                          P(None, sp_axis), P(None, sp_axis)),
                out_specs=(P(None, sp_axis), P(None, sp_axis), P(), P()),
                axis_names=frozenset({sp_axis}),
            )(feat_c0, feat_c1, m0, m1)
        else:
            extracted = streaming_match_extract(feat_c0, feat_c1,
                                                temperature, mask0, mask1)
        row_best, j_ids, col_arg, conf00 = jax.lax.stop_gradient(extracted)
        mutual = jnp.take_along_axis(col_arg, j_ids, axis=1) == \
            jnp.arange(l0, dtype=jnp.int32)[None, :]
        ids = _finalize_ids(row_best, j_ids, mutual, conf00,
                            feat_c1.shape[1], thr, capacity, force_one,
                            mask0, mask1)
        empty = jnp.zeros((b, 0, 0), feat_c0.dtype)
        return CoarseMatches(empty, *ids)
    conf = dual_softmax(feat_c0, feat_c1, temperature, mask0, mask1)
    return extract_matches(conf, thr, capacity, force_one, mask0, mask1)


def match_coords(ids: jax.Array, grid_w: int, scale: int) -> jax.Array:
    """Cell indices -> pixel coords (x, y) = (i % w, i // w) * scale
    (reference: coarse_matching.py:199-205)."""
    x = (ids % grid_w) * scale
    y = (ids // grid_w) * scale
    return jnp.stack([x, y], axis=-1).astype(jnp.float32)
