"""Sequence-parallel (token-sharded) matching: exactness vs replicated.

The SP path (core/spmd.py, GeoFormerConfig.seq_axis) shards one pair's
token/spatial dimension over the mesh: spatially-partitioned backbone,
token-sharded linear attention (psum contractions), and row-sharded
streaming match extraction with cross-device LSE/argmax merges. None of it
is an approximation — these tests pin the sharded results to the replicated
ones on the 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: full loops / 8-device compiles / torch cross-tests
from jax.sharding import Mesh, PartitionSpec as P

from geoformer_tpu.config import GeoFormerConfig, GeoModuleConfig, MatchConfig
from geoformer_tpu.models import GeoFormer
from geoformer_tpu.ops.fused_loss import streaming_match_extract


def _mesh() -> Mesh:
    return Mesh(np.array(jax.devices()).reshape(8), ("seq",))


@pytest.mark.parametrize("masked", [False, True])
def test_sp_extract_matches_replicated(masked):
    rng = np.random.default_rng(0)
    b, l, s, c = 2, 64, 64, 32
    f0 = jnp.asarray(rng.normal(size=(b, l, c)), jnp.float32)
    f1 = jnp.asarray(rng.normal(size=(b, s, c)), jnp.float32)
    if masked:
        m0 = jnp.asarray(rng.random((b, l)) > 0.15)
        m1 = jnp.asarray(rng.random((b, s)) > 0.15)
    else:
        m0 = jnp.ones((b, l), bool)
        m1 = jnp.ones((b, s), bool)

    ref_rb, ref_j, ref_ca, ref_c00 = streaming_match_extract(
        f0, f1, 0.1, m0, m1, chunk=16)

    with jax.sharding.set_mesh(_mesh()):
        sp_fn = jax.jit(jax.shard_map(
            lambda a, bf, x, y: streaming_match_extract(
                a, bf, 0.1, x, y, axis_name="seq"),
            in_specs=(P(None, "seq", None), P(None, "seq", None),
                      P(None, "seq"), P(None, "seq")),
            out_specs=(P(None, "seq"), P(None, "seq"), P(), P())))
        sp_rb, sp_j, sp_ca, sp_c00 = sp_fn(f0, f1, m0, m1)

    rb0, rb1 = np.asarray(ref_rb), np.asarray(sp_rb)
    np.testing.assert_allclose(rb0, rb1, rtol=2e-5, atol=1e-8)
    # Row argmax on valid rows must agree exactly.
    rows = np.asarray(m0)
    assert (np.asarray(ref_j) == np.asarray(sp_j))[rows].all()
    # Column argmax on valid columns; invalid columns carry junk in both.
    cols = np.asarray(m1)
    assert (np.asarray(ref_ca) == np.asarray(sp_ca))[cols].all()
    np.testing.assert_allclose(np.asarray(ref_c00), np.asarray(sp_c00),
                               rtol=2e-5, atol=1e-10)


def test_sp_full_model_matches_replicated():
    """End-to-end: GeoFormer with seq_axis set, inputs token-sharded over the
    mesh, must reproduce the replicated pipeline (features to 1e-4, match
    decisions near-identical modulo float-tie jitter)."""
    # Low threshold so the match set is well-populated on a random-init
    # model — the overlap statistic below is meaningless on 0-1 matches.
    cfg = GeoFormerConfig(
        match=MatchConfig(thr=0.01, max_matches=64),
        geo=GeoModuleConfig(ransac_iters=64, max_inliers=128),
    )
    model = GeoFormer(cfg)
    key = jax.random.key(0)
    rng = np.random.default_rng(3)
    img0 = jnp.asarray(rng.random((1, 64, 80, 1)), jnp.float32)
    # img1: a shifted copy so first-pass matches (and hence the GAM branch
    # with a real homography) are exercised, not just the fallback.
    img1 = jnp.roll(img0, 8, axis=2)
    params = model.init({"params": key, "ransac": key}, img0, img1)

    def run(m, p, a, b):
        return m.apply(p, a, b, return_feats=True,
                       rngs={"ransac": jax.random.key(1)})

    ref = jax.jit(lambda p, a, b: run(model, p, a, b))(params, img0, img1)

    sp_model = GeoFormer(cfg.replace(seq_axis="seq"))
    with jax.sharding.set_mesh(_mesh()):
        out = jax.jit(lambda p, a, b: run(sp_model, p, a, b))(
            params, img0, img1)

    # Continuous quantities: transformer + GAM features.
    for a, b, name in zip(ref.feats, out.feats, ["f0", "f1", "g0", "g1"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(ref.geo.H), np.asarray(out.geo.H),
                               rtol=1e-3, atol=1e-4)
    assert bool(ref.geo.has_H[0]) == bool(out.geo.has_H[0])

    # Discrete match decisions: allow a tiny tie-flip margin.
    def pairs(o):
        v = np.asarray(o.matches.valid[0])
        i = np.asarray(o.matches.i_ids[0])[v]
        j = np.asarray(o.matches.j_ids[0])[v]
        return set(zip(i.tolist(), j.tolist()))

    pr, ps = pairs(ref), pairs(out)
    union = max(len(pr | ps), 1)
    assert len(pr & ps) / union >= 0.9, (len(pr & ps), union)

    # Final keypoints for the common coarse matches agree to the pixel.
    vr = np.asarray(ref.fine.valid[0]) & np.asarray(out.fine.valid[0])
    if vr.any():
        same = np.asarray(ref.matches.i_ids[0]) == \
            np.asarray(out.matches.i_ids[0])
        sel = vr & same
        np.testing.assert_allclose(np.asarray(ref.fine.mkpts1[0])[sel],
                                   np.asarray(out.fine.mkpts1[0])[sel],
                                   atol=1e-2)


def test_sp_composes_with_data_parallel_2d_mesh():
    """data x seq 2-D mesh: batch sharded over 'data' while each pair's
    tokens shard over 'seq' (partial manualization in coarse_match keeps the
    batch dim's data sharding through the extraction)."""
    from jax.sharding import NamedSharding

    cfg = GeoFormerConfig(
        match=MatchConfig(thr=0.01, max_matches=64),
        geo=GeoModuleConfig(ransac_iters=64, max_inliers=128),
    )
    model = GeoFormer(cfg)
    key = jax.random.key(0)
    rng = np.random.default_rng(6)
    img0 = jnp.asarray(rng.random((2, 64, 80, 1)), jnp.float32)
    img1 = jnp.roll(img0, 8, axis=2)
    params = model.init({"params": key, "ransac": key}, img0[:1], img0[:1])

    def run(m, p, a, b):
        return m.apply(p, a, b, return_feats=True,
                       rngs={"ransac": jax.random.key(1)})

    ref = jax.jit(lambda p, a, b: run(model, p, a, b))(params, img0, img1)

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "seq"))
    sp_model = GeoFormer(cfg.replace(seq_axis="seq"))
    with jax.sharding.set_mesh(mesh):
        sh = NamedSharding(mesh, P("data", "seq", None, None))
        out = jax.jit(lambda p, a, b: run(sp_model, p, a, b))(
            params, jax.device_put(img0, sh), jax.device_put(img1, sh))

    for a, b, name in zip(ref.feats, out.feats, ["f0", "f1", "g0", "g1"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(ref.geo.H), np.asarray(out.geo.H),
                               rtol=1e-3, atol=1e-4)


def test_sp_train_step_matches_replicated():
    """A full self-supervised TRAIN step (forward + streaming loss +
    backward + optimizer update) under sequence parallelism must reproduce
    the replicated step: loss scalars and updated parameters."""
    from geoformer_tpu.config import TrainConfig
    from geoformer_tpu.data.synthetic import make_pair_batch
    from geoformer_tpu.train.trainer import init_state, make_train_step

    cfg = GeoFormerConfig(
        match=MatchConfig(max_matches=32, force_one_match=True),
        geo=GeoModuleConfig(ransac_iters=32, max_inliers=32),
    )
    tcfg = TrainConfig(batch_size=1, image_hw=(64, 80))
    rng = np.random.default_rng(8)
    base = jnp.asarray(rng.random((1, 64, 80)), jnp.float32)
    batch = make_pair_batch(base, jax.random.key(1))
    lr = jnp.asarray(1e-4, jnp.float32)

    model = GeoFormer(cfg)
    state, opt = init_state(model, tcfg, jax.random.key(0))
    step = jax.jit(make_train_step(model, opt, tcfg))
    ref_state, ref_metrics = step(state, batch, jax.random.key(2), lr)

    sp_model = GeoFormer(cfg.replace(seq_axis="seq"))
    sp_state, _ = init_state(sp_model.bind({}) if False else model, tcfg,
                             jax.random.key(0))  # same init as replicated
    sp_step_fn = make_train_step(sp_model, opt, tcfg)
    with jax.sharding.set_mesh(_mesh()):
        sp_state2, sp_metrics = jax.jit(sp_step_fn)(
            sp_state, batch, jax.random.key(2), lr)

    for k in ("loss", "loss_c", "loss_d", "loss_f"):
        np.testing.assert_allclose(float(sp_metrics[k]),
                                   float(ref_metrics[k]), rtol=2e-3,
                                   err_msg=k)
    # updated parameters agree (same data, same rng, psum'd loss reductions)
    ref_leaves = jax.tree.leaves(ref_state.params)
    sp_leaves = jax.tree.leaves(sp_state2.params)
    worst = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(ref_leaves, sp_leaves))
    assert worst < 5e-3, worst
