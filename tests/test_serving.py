"""AOT export / serving bundle roundtrip (geoformer_tpu/serving/export.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # bundle exports recompile the full model repeatedly

from geoformer_tpu.config import (
    FineMatchConfig,
    GeoFormerConfig,
    GeoModuleConfig,
    MatchConfig,
)
from geoformer_tpu.models import GeoFormer
from geoformer_tpu.serving import load_bundle, save_bundle


@pytest.fixture(scope="module")
def small_setup():
    # zero thresholds: random-init weights rarely clear the confidence
    # gates, and the roundtrip comparison needs populated valid slots.
    cfg = GeoFormerConfig(
        match=MatchConfig(max_matches=64, thr=0.0, force_one_match=True),
        geo=GeoModuleConfig(ransac_iters=64, max_inliers=64,
                            use_pallas_self=False),
        fine_match=FineMatchConfig(thr=0.0),
    )
    model = GeoFormer(cfg)
    key = jax.random.key(0)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.random((1, 96, 128, 1), np.float32))
    img1 = jnp.asarray(rng.random((1, 96, 128, 1), np.float32))
    variables = model.init({"params": key, "ransac": key}, img0, img1)
    return cfg, model, variables, img0, img1


def test_bundle_roundtrip_matches_direct_apply(tmp_path, small_setup):
    cfg, model, variables, img0, img1 = small_setup
    path = str(tmp_path / "matcher.gfmz")
    save_bundle(path, cfg, variables, hw=(96, 128), batch=1)

    served = load_bundle(path)
    assert served.batch == 1 and served.hw == (96, 128)
    got = served(img0, img1)

    ref = model.apply(variables, img0, img1,
                      mask0=jnp.ones((1, 12, 16)),
                      mask1=jnp.ones((1, 12, 16)),
                      rngs={"ransac": jax.random.key(0)})
    assert got["valid"].any(), "no matches from the served bundle"
    np.testing.assert_array_equal(got["valid"], np.asarray(ref.fine.valid))
    np.testing.assert_allclose(got["mkpts0"], np.asarray(ref.fine.mkpts0),
                               atol=1e-5)
    np.testing.assert_allclose(got["mkpts1"], np.asarray(ref.fine.mkpts1),
                               atol=1e-5)
    np.testing.assert_allclose(got["mconf"], np.asarray(ref.fine.mconf),
                               atol=1e-5)


def test_bundle_default_masks_and_manifest(tmp_path, small_setup):
    cfg, _, variables, img0, img1 = small_setup
    path = str(tmp_path / "m2.gfmz")
    save_bundle(path, cfg, variables, hw=(96, 128), batch=1)
    served = load_bundle(path)
    # explicit full masks == default masks
    full = served(img0, img1,
                  mask0=np.ones((1, 12, 16), np.float32),
                  mask1=np.ones((1, 12, 16), np.float32))
    default = served(img0, img1)
    np.testing.assert_array_equal(full["valid"], default["valid"])
    np.testing.assert_allclose(full["mkpts0"], default["mkpts0"], atol=1e-6)
    m = served.manifest
    assert m["max_matches"] == 64
    assert m["platforms"], m
    assert m["config"]["geo"]["ransac_iters"] == 64


def test_bundle_loads_in_fresh_process(tmp_path, small_setup):
    """A serving process imports only jax + numpy — no model code.

    Also regression-guards the LAPACK FFI priming in load_bundle: without
    it, a fresh process segfaults inside Exported.call on the RANSAC
    eigh custom call (jaxlib 0.9 CPU).
    """
    import subprocess
    import sys

    cfg, _, variables, _, _ = small_setup
    path = str(tmp_path / "m3.gfmz")
    save_bundle(path, cfg, variables, hw=(96, 128), batch=1)
    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from geoformer_tpu.serving import load_bundle
m = load_bundle({path!r})
r = np.random.default_rng(0)
out = m(r.random((1, 96, 128, 1), dtype=np.float32),
        r.random((1, 96, 128, 1), dtype=np.float32))
assert out["mkpts0"].shape == (1, 64, 2), out["mkpts0"].shape
print("SERVED_OK", int(out["valid"].sum()))
"""
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    assert res.returncode == 0, (res.returncode, res.stderr[-2000:])
    assert "SERVED_OK" in res.stdout, res.stdout


def test_int8_bundle_roundtrip(tmp_path, small_setup):
    """`cli export --int8-full` lowers the quantized graph into the bundle.

    Int8Conv/Int8Dense share nn.Conv/nn.Dense param trees, so the SAME
    variables serve both precisions; the quantization is baked into the
    StableHLO program, not the weights.
    """
    import dataclasses

    cfg, _, variables, img0, img1 = small_setup
    icfg = dataclasses.replace(
        cfg,
        backbone=dataclasses.replace(cfg.backbone, int8=True),
        coarse=dataclasses.replace(cfg.coarse, int8=True),
        fine=dataclasses.replace(cfg.fine, int8=True),
        geo=dataclasses.replace(cfg.geo, int8=True),
    )
    path = str(tmp_path / "m_int8.gfmz")
    save_bundle(path, icfg, variables, hw=(96, 128), batch=1)
    served = load_bundle(path)
    got = served(img0, img1)

    assert got["valid"].any(), "no matches from the int8 bundle"
    assert got["mkpts0"].shape == (1, 64, 2)
    assert served.manifest["config"]["backbone"]["int8"] is True
    assert served.manifest["config"]["coarse"]["int8"] is True
    # The quantized graph must be baked into the StableHLO program itself
    # (not just recorded in the manifest): int8 operands appear in the
    # lowered module. (Numeric slot-equality vs a JIT apply does NOT hold:
    # ulp-level max-abs scale differences between the two compilations flip
    # round() through 12 layers, reshuffling near-tie top-k slots at random
    # init — with trained weights the paths agree; see tests/test_quantize.)
    mlir = served._exported.mlir_module()
    assert "i8" in mlir and "convolution" in mlir, "no int8 conv in bundle"


def test_export_rejects_unaligned_hw(small_setup):
    cfg, _, variables, _, _ = small_setup
    from geoformer_tpu.serving import export_matcher

    with pytest.raises(ValueError):
        export_matcher(cfg, variables, hw=(100, 128), batch=1)
