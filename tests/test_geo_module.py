"""GAM semantics: RANSAC state construction and per-sample fallbacks.

Checks the reference's branch behaviors (geo_module.py:46-80): with <= 8
matches no homography is fit — cross layers are identity and the self-
attention membership covers all first-pass matches; with enough inlier
structure has_H is set and the membership narrows to RANSAC inliers.
"""

import jax
import jax.numpy as jnp
import numpy as np

from geoformer_tpu.config import GeoFormerConfig, GeoModuleConfig, MatchConfig
from geoformer_tpu.models.coarse_matching import CoarseMatches
from geoformer_tpu.models.geo_module import GeoModule, _build_geo_state


def _matches(l0, pairs, valid_n):
    """Dense-mode matches with the first valid_n rows matched to given j."""
    i_ids = jnp.arange(l0, dtype=jnp.int32)[None]
    j = np.zeros(l0, np.int32)
    v = np.zeros(l0, bool)
    for k, (i, jj) in enumerate(pairs):
        j[i] = jj
        v[i] = True
    return CoarseMatches(
        conf=jnp.zeros((1, l0, l0)),
        i_ids=i_ids,
        j_ids=jnp.asarray(j)[None],
        valid=jnp.asarray(v)[None],
        mconf=jnp.asarray(v, np.float32)[None],
    )


def test_geo_state_no_H_with_few_matches():
    cfg = GeoModuleConfig(ransac_iters=32, max_inliers=32)
    # 5 matches < min_matches=8 -> no homography
    pairs = [(i, i) for i in range(5)]
    m = _matches(80, pairs, 5)
    state = _build_geo_state(m, jax.random.key(0), (8, 10), (8, 10), 8, cfg)
    assert not bool(state.has_H[0])
    # membership = all first-pass matches (M-is-None branch)
    assert int(state.map0[0].sum()) == 5
    assert bool(state.map0[0, :5].all())


def test_geo_state_identity_motion_finds_H():
    cfg = GeoModuleConfig(ransac_iters=64, max_inliers=64)
    # 20 identity matches -> H ~ I, all inliers
    pairs = [(i * 4 + 1, i * 4 + 1) for i in range(20)]
    m = _matches(80, pairs, 20)
    state = _build_geo_state(m, jax.random.key(1), (8, 10), (8, 10), 8, cfg)
    assert bool(state.has_H[0])
    H = np.asarray(state.H[0])
    np.testing.assert_allclose(H / H[2, 2], np.eye(3), atol=0.2)
    assert int(state.num_inliers[0]) >= 18


def test_geo_module_cross_identity_without_H():
    """Samples without a homography must pass cross layers unchanged."""
    cfg = GeoFormerConfig(
        match=MatchConfig(max_matches=16),
        geo=GeoModuleConfig(ransac_iters=16, max_inliers=16,
                            layer_names=("cross",)),
    )
    geo = GeoModule(cfg.geo, 32)
    rng = np.random.default_rng(0)
    cnn = jnp.asarray(rng.random((1, 8, 10, 32)), jnp.float32)
    m = _matches(80, [(0, 0), (1, 1)], 2)
    m = m._replace(i_ids=m.i_ids[:, :16], j_ids=m.j_ids[:, :16],
                   valid=m.valid[:, :16], mconf=m.mconf[:, :16])
    key = jax.random.key(2)
    params = geo.init({"params": key, "ransac": key}, cnn, cnn, m, 8, key)
    f0, f1, state = geo.apply(params, cnn, cnn, m, 8, key,
                              rngs={"ransac": key})
    assert not bool(state.has_H[0])
    # cross-only stack + no H -> features are exactly PE-augmented inputs
    from geoformer_tpu.models.position import add_position_encoding

    expect = add_position_encoding(cnn).reshape(1, 80, 32)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(expect), atol=1e-6)


def test_window_attend_equals_window_call():
    """Pre-projected gathered K/V must equal projecting gathered windows."""
    from geoformer_tpu.models.transformer import EncoderLayer

    rng = np.random.default_rng(1)
    d, h, l, w = 16, 2, 6, 4
    x = jnp.asarray(rng.normal(size=(1, l, d)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(1, 10, d)).astype(np.float32))
    cells = jnp.asarray(rng.integers(0, 10, (1, l, w)))
    mask = jnp.asarray(rng.random((1, l, w)) > 0.2)

    layer = EncoderLayer(d, h, attention="full", mlp_act="tanh")
    params = layer.init(jax.random.key(0), x, src)

    win = jax.vmap(lambda s, c: jnp.take(s, c.reshape(-1), axis=0))(
        src, cells).reshape(1, l, w, d)
    ref = layer.apply(params, x, win, mask, method=layer.window_call)

    def pre(mod, x, src):
        k, v = mod.project_kv(src)
        kw = jax.vmap(lambda t, c: jnp.take(
            t.reshape(-1, h * (d // h)), c.reshape(-1), axis=0))(
            k.reshape(1, 10, -1), cells).reshape(1, l, w, h, d // h)
        vw = jax.vmap(lambda t, c: jnp.take(
            t.reshape(-1, h * (d // h)), c.reshape(-1), axis=0))(
            v.reshape(1, 10, -1), cells).reshape(1, l, w, h, d // h)
        return mod.window_attend(x, kw, vw, mask)

    ours = layer.apply(params, x, src, method=pre)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)
