"""Coarse match extraction and fine decode semantics."""

import jax.numpy as jnp
import numpy as np

from geoformer_tpu.models.coarse_matching import (
    CoarseMatches,
    extract_matches,
    match_coords,
)
from geoformer_tpu.models.fine import fine_matching, gather_windows


def _conf_from_pairs(l0, l1, pairs, base=0.01):
    conf = np.full((1, l0, l1), base, np.float32)
    for (i, j, c) in pairs:
        conf[0, i, j] = c
    return jnp.asarray(conf)


def test_extract_dense_mutual_nn():
    conf = _conf_from_pairs(4, 5, [(0, 1, 0.9), (2, 3, 0.8), (3, 3, 0.5)])
    m = extract_matches(conf, thr=0.2, capacity=-1)
    v = np.asarray(m.valid[0])
    # row 3 hits column 3 whose max is row 2 -> not mutual
    assert v.tolist() == [True, False, True, False]
    assert np.asarray(m.j_ids[0])[[0, 2]].tolist() == [1, 3]
    assert np.allclose(np.asarray(m.mconf[0])[[0, 2]], [0.9, 0.8])


def test_extract_threshold():
    conf = _conf_from_pairs(3, 3, [(0, 0, 0.15), (1, 1, 0.6)])
    m = extract_matches(conf, thr=0.2, capacity=-1)
    assert np.asarray(m.valid[0]).tolist() == [False, True, False]


def test_extract_force_one():
    conf = _conf_from_pairs(3, 3, [], base=0.01)
    m = extract_matches(conf, thr=0.2, capacity=-1, force_one=True)
    v = np.asarray(m.valid[0])
    assert v.tolist() == [True, False, False]
    assert int(m.j_ids[0, 0]) == 0
    assert np.isclose(float(m.mconf[0, 0]), 0.01)


def test_extract_capacity_topk():
    conf = _conf_from_pairs(6, 6, [(0, 0, 0.3), (1, 1, 0.9), (2, 2, 0.5),
                                   (3, 3, 0.7)])
    m = extract_matches(conf, thr=0.2, capacity=2)
    assert np.asarray(m.i_ids[0]).tolist() == [1, 3]  # two highest conf
    assert np.asarray(m.j_ids[0]).tolist() == [1, 3]
    assert bool(m.valid.all())


def test_match_coords():
    xy = np.asarray(match_coords(jnp.asarray([0, 1, 7, 8]), grid_w=7, scale=8))
    assert xy.tolist() == [[0, 0], [8, 0], [0, 8], [8, 8]]


def test_gather_windows_center_and_border():
    b, hf, wf, c = 1, 8, 8, 3
    feat = jnp.arange(b * hf * wf * c, dtype=jnp.float32).reshape(b, hf, wf, c)
    # coarse grid 2x2 (stride 4), window 5
    ids = jnp.asarray([[0, 3]])  # cells (0,0) and (1,1)
    win = gather_windows(feat, ids, grid_w_c=2, stride=4, window=5)
    assert win.shape == (1, 2, 25, 3)
    # center of window = fine cell (stride*row, stride*col)
    np.testing.assert_allclose(np.asarray(win[0, 0, 12]), np.asarray(feat[0, 0, 0]))
    np.testing.assert_allclose(np.asarray(win[0, 1, 12]), np.asarray(feat[0, 4, 4]))
    # top-left corner window has zero padding at its first entries
    np.testing.assert_allclose(np.asarray(win[0, 0, 0]), 0.0)


def test_fine_matching_decode():
    b, m, w = 1, 2, 5
    ww = w * w
    conf = np.full((b, m, ww, ww), 1e-4, np.float32)
    # match 0: argmax at window cell i=(1,2)->idx 7 maps to j=(3,1)->idx 16
    conf[0, 0, 7, 16] = 0.9
    # match 1: below threshold
    conf[0, 1, 3, 3] = 0.05
    matches = CoarseMatches(
        conf=jnp.zeros((b, 4, 4)),
        i_ids=jnp.asarray([[5, 6]]),
        j_ids=jnp.asarray([[9, 10]]),
        valid=jnp.asarray([[True, True]]),
        mconf=jnp.asarray([[0.5, 0.5]]),
    )
    out = fine_matching(jnp.asarray(conf), matches, grid_w0=4, grid_w1=4,
                        coarse_scale=8, fine_scale=2, window=5, thr=0.1)
    assert np.asarray(out.valid[0]).tolist() == [True, False]
    # centers: cell 5 -> (1,1)*8 = (8,8); cell 9 -> (1,2)... x=(9%4)*8=8, y=(9//4)*8=16
    # offsets: i=7 -> (7%5-2, 7//5-2) = (0,-1) *2 ; j=16 -> (16%5-2, 16//5-2)=(-1,1)*2
    np.testing.assert_allclose(np.asarray(out.mkpts0[0, 0]), [8 + 0, 8 - 2])
    np.testing.assert_allclose(np.asarray(out.mkpts1[0, 0]), [8 - 2, 16 + 2])
    assert np.isclose(float(out.mconf[0, 0]), 0.9)


def test_streaming_extract_matches_dense():
    """streaming=True must reproduce the dense extraction exactly (indices,
    validity) and the confidences to float tolerance, across masks,
    force_one and capacity settings — without building [B, L0, L1]."""
    from geoformer_tpu.models.coarse_matching import coarse_match

    rng = np.random.default_rng(3)
    b, l0, l1, c = 2, 40, 32, 16
    f0 = jnp.asarray(rng.normal(size=(b, l0, c)).astype(np.float32))
    f1 = jnp.asarray(rng.normal(size=(b, l1, c)).astype(np.float32))
    mask0 = jnp.asarray(rng.random((b, l0)) > 0.2)
    mask1 = jnp.asarray(rng.random((b, l1)) > 0.2)

    for kwargs in (
            dict(),
            dict(mask0=mask0, mask1=mask1),
            dict(force_one=True, thr=0.99),      # forces the (0,0) slot
            dict(capacity=8),
            dict(mask0=mask0, mask1=mask1, capacity=8, force_one=True),
    ):
        kw = dict(thr=0.05, temperature=0.1, capacity=-1)
        kw.update(kwargs)
        dense = coarse_match(f0, f1, **kw, streaming=False)
        stream = coarse_match(f0, f1, **kw, streaming=True)
        assert stream.conf.shape == (b, 0, 0)
        np.testing.assert_array_equal(np.asarray(dense.i_ids),
                                      np.asarray(stream.i_ids))
        np.testing.assert_array_equal(np.asarray(dense.valid),
                                      np.asarray(stream.valid))
        # j_ids only meaningful on valid slots
        v = np.asarray(dense.valid)
        np.testing.assert_array_equal(np.asarray(dense.j_ids)[v],
                                      np.asarray(stream.j_ids)[v])
        np.testing.assert_allclose(np.asarray(dense.mconf),
                                   np.asarray(stream.mconf),
                                   rtol=1e-4, atol=1e-6)


def test_streaming_extract_bf16():
    """bf16 feature path: the tile matmuls run bf16xbf16->f32 on the MXU
    (ops/fused_loss._prep keeps the input dtype) — extraction indices must
    match a dense f32 computation over the same bf16-quantized features,
    and confidences must agree to bf16-accumulation tolerance."""
    from geoformer_tpu.ops.fused_loss import streaming_match_extract
    from geoformer_tpu.ops.matching import dual_softmax

    rng = np.random.default_rng(11)
    b, l0, l1, c = 2, 40, 32, 16
    f0h = jnp.asarray(rng.normal(size=(b, l0, c)), jnp.bfloat16)
    f1h = jnp.asarray(rng.normal(size=(b, l1, c)), jnp.bfloat16)
    conf = np.asarray(dual_softmax(f0h.astype(jnp.float32),
                                   f1h.astype(jnp.float32), 0.1))
    row_best, j_ids, col_arg, conf00 = streaming_match_extract(
        f0h, f1h, 0.1, chunk=16)
    assert row_best.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(j_ids), conf.argmax(2))
    np.testing.assert_array_equal(np.asarray(col_arg), conf.argmax(1))
    np.testing.assert_allclose(np.asarray(row_best), conf.max(2),
                               rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(conf00), conf[:, 0, 0],
                               rtol=5e-3, atol=1e-5)


def test_streaming_extract_chunked():
    """Chunk boundary correctness: l0 not divisible by chunk."""
    from geoformer_tpu.ops.fused_loss import streaming_match_extract
    from geoformer_tpu.ops.matching import dual_softmax

    rng = np.random.default_rng(5)
    b, l0, l1, c = 1, 23, 17, 8
    f0 = jnp.asarray(rng.normal(size=(b, l0, c)).astype(np.float32))
    f1 = jnp.asarray(rng.normal(size=(b, l1, c)).astype(np.float32))
    conf = np.asarray(dual_softmax(f0, f1, 0.1))
    row_best, j_ids, col_arg, conf00 = streaming_match_extract(
        f0, f1, 0.1, chunk=7)
    np.testing.assert_allclose(np.asarray(row_best), conf.max(2)[0][None],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(j_ids)[0], conf[0].argmax(1))
    np.testing.assert_array_equal(np.asarray(col_arg)[0], conf[0].argmax(0))
    np.testing.assert_allclose(float(conf00[0]), conf[0, 0, 0], rtol=1e-4)
