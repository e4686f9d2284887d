"""Full-model smoke tests: init, forward shapes, jit, and GAM behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: full loops / 8-device compiles / torch cross-tests

from geoformer_tpu.config import GeoFormerConfig, MatchConfig, GeoModuleConfig
from geoformer_tpu.models import GeoFormer


@pytest.fixture(scope="module")
def small_cfg():
    return GeoFormerConfig(
        match=MatchConfig(thr=0.2, max_matches=64),
        geo=GeoModuleConfig(ransac_iters=64, max_inliers=128),
    )


@pytest.fixture(scope="module")
def model_and_params(small_cfg):
    model = GeoFormer(small_cfg)
    key = jax.random.key(0)
    img = jnp.zeros((1, 64, 80, 1))
    params = model.init({"params": key, "ransac": key}, img, img)
    return model, params


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    b, H, W = 2, 64, 80
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.random((b, H, W, 1)), jnp.float32)
    img1 = jnp.asarray(rng.random((b, H, W, 1)), jnp.float32)
    out = model.apply(params, img0, img1, return_conf=True,
                      rngs={"ransac": jax.random.key(1)})
    l = (H // 8) * (W // 8)
    m = 64
    assert out.dect_conf.shape == (b, l, l)
    assert out.conf.shape == (b, l, l)
    # inference default omits the dense conf matrices
    out_eval = model.apply(params, img0[:1], img1[:1],
                           rngs={"ransac": jax.random.key(1)})
    assert out_eval.conf.shape == (1, 0, 0)
    assert out.fine.mkpts0.shape == (b, m, 2)
    assert out.fine.mkpts1.shape == (b, m, 2)
    assert out.fine.valid.shape == (b, m)
    assert out.fine.fine_conf.shape == (b, m, 25, 25)
    assert np.isfinite(np.asarray(out.conf)).all()
    assert np.isfinite(np.asarray(out.fine.mkpts0)).all()


def test_identical_images_match_identity(model_and_params):
    """Matching an image with itself (random params, untrained) must at least
    produce finite outputs and plausible keypoint ranges."""
    model, params = model_and_params
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((1, 64, 80, 1)), jnp.float32)
    out = model.apply(params, img, img, rngs={"ransac": jax.random.key(2)})
    pts = np.asarray(out.fine.mkpts0)
    assert (pts[..., 0] >= -8).all() and (pts[..., 0] <= 88).all()
    assert (pts[..., 1] >= -8).all() and (pts[..., 1] <= 72).all()


def test_jit_forward(model_and_params):
    model, params = model_and_params
    img = jnp.ones((1, 64, 80, 1)) * 0.5

    @jax.jit
    def fwd(params, i0, i1):
        return model.apply(params, i0, i1, rngs={"ransac": jax.random.key(0)})

    out = fwd(params, img, img)
    assert np.isfinite(np.asarray(out.conf)).all()


def test_mask_padding_kills_matches(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((1, 64, 80, 1)), jnp.float32)
    hc, wc = 8, 10
    mask0 = jnp.zeros((1, hc, wc)).at[:, :4, :5].set(1.0)
    mask1 = jnp.ones((1, hc, wc))
    out = model.apply(params, img, img, mask0=mask0, mask1=mask1,
                      rngs={"ransac": jax.random.key(3)})
    # all matches must originate from the unpadded quadrant of image0
    i = np.asarray(out.matches.i_ids[0])
    v = np.asarray(out.matches.valid[0])
    rows, cols = i // wc, i % wc
    assert ((rows[v] < 4) & (cols[v] < 5)).all()


def test_sinkhorn_match_type_runs():
    cfg = GeoFormerConfig(
        match=MatchConfig(thr=0.05, max_matches=32, match_type="sinkhorn"),
        geo=GeoModuleConfig(ransac_iters=32, max_inliers=32),
    )
    model = GeoFormer(cfg)
    key = jax.random.key(0)
    img = jnp.asarray(np.random.default_rng(3).random((1, 64, 80, 1)),
                      jnp.float32)
    params = model.init({"params": key, "ransac": key}, img, img)
    assert "bin_score" in params["params"]
    out = model.apply(params, img, img, rngs={"ransac": jax.random.key(1)})
    assert np.isfinite(np.asarray(out.conf)).all()


def test_plain_loftr_family():
    from geoformer_tpu.models.loftr import LoFTR, soft_argmax_match

    cfg = GeoFormerConfig(match=MatchConfig(thr=0.01, max_matches=32))
    model = LoFTR(cfg)
    key = jax.random.key(0)
    img = jnp.asarray(np.random.default_rng(5).random((1, 64, 80, 1)),
                      jnp.float32)
    params = model.init(key, img, img)
    out = model.apply(params, img, img)
    assert out.expec_f.shape == (1, 32, 3)
    assert np.isfinite(np.asarray(out.mkpts1)).all()
    # soft-argmax sanity: a delta heatmap at a known cell decodes there
    w = 5
    f1 = np.zeros((1, w * w, 8), np.float32)
    f0 = np.zeros((1, w * w, 8), np.float32)
    f0[0, :, 0] = 0.0
    f0[0, w * w // 2, 0] = 1.0
    f1[0, 7, 0] = 50.0  # cell (row 1, col 2) attracts all mass
    coords, std = soft_argmax_match(jnp.asarray(f0), jnp.asarray(f1), w)
    # normalized coords of cell 7 = (x=2, y=1) -> ((2/4)*2-1, (1/4)*2-1)
    np.testing.assert_allclose(np.asarray(coords[0]), [0.0, -0.5], atol=1e-2)
