"""Numerical parity against torch oracles through the weight converter.

The torch modules here are independent oracles written from the architecture
description (bias-free QKV + linear attention + concat-MLP; ResNet basic
blocks with BN + FPN top-down). Converting their weights into the flax model
and matching outputs validates both the converter's layout mapping and the
layer math — the same path a released reference checkpoint would take.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from geoformer_tpu.models.backbone import ResNetFPN
from geoformer_tpu.models.transformer import EncoderLayer
from geoformer_tpu.utils.torch_convert import (
    _convert_backbone,
    _convert_encoder_layer,
)


class TorchEncoderLayer(nn.Module):
    def __init__(self, d, nhead):
        super().__init__()
        self.d = d
        self.h = nhead
        self.q_proj = nn.Linear(d, d, bias=False)
        self.k_proj = nn.Linear(d, d, bias=False)
        self.v_proj = nn.Linear(d, d, bias=False)
        self.merge = nn.Linear(d, d, bias=False)
        self.mlp = nn.Sequential(nn.Linear(2 * d, 2 * d, bias=False),
                                 nn.ReLU(True), nn.Linear(2 * d, d, bias=False))
        self.norm1 = nn.LayerNorm(d)
        self.norm2 = nn.LayerNorm(d)

    def forward(self, x, source):
        bs = x.size(0)
        dim = self.d // self.h
        q = self.q_proj(x).view(bs, -1, self.h, dim)
        k = self.k_proj(source).view(bs, -1, self.h, dim)
        v = self.v_proj(source).view(bs, -1, self.h, dim)
        Q = F.elu(q) + 1
        K = F.elu(k) + 1
        s = v.size(1)
        vs = v / s
        KV = torch.einsum("nshd,nshv->nhdv", K, vs)
        Z = 1 / (torch.einsum("nlhd,nhd->nlh", Q, K.sum(1)) + 1e-6)
        msg = torch.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * s
        msg = self.merge(msg.reshape(bs, -1, self.d))
        msg = self.norm1(msg)
        msg = self.norm2(self.mlp(torch.cat([x, msg], -1)))
        return x + msg


def test_encoder_layer_parity_via_converter():
    torch.manual_seed(0)
    d, h = 16, 2
    tl = TorchEncoderLayer(d, h).eval()
    sd = {f"layer.{k}": v.detach().numpy() for k, v in
          tl.state_dict().items()}

    params = {}
    _convert_encoder_layer(params, sd, "layer", ("enc",))

    model = EncoderLayer(d, h, attention="linear", mlp_act="relu")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, d)).astype(np.float32)
    src = rng.normal(size=(2, 7, d)).astype(np.float32)
    with torch.no_grad():
        ref = tl(torch.from_numpy(x), torch.from_numpy(src)).numpy()
    ours = np.asarray(model.apply({"params": params["enc"]},
                                  jnp.asarray(x), jnp.asarray(src)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = (
            nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False),
                          nn.BatchNorm2d(cout)) if stride != 1 else None)

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class TorchResNetFPN(nn.Module):
    def __init__(self, initial_dim=8, block_dims=(8, 12, 16)):
        super().__init__()
        d1, d2, d3 = block_dims
        self.conv1 = nn.Conv2d(1, initial_dim, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(initial_dim)
        self.layer1 = nn.Sequential(TorchBasicBlock(initial_dim, d1, 1),
                                    TorchBasicBlock(d1, d1, 1))
        self.layer2 = nn.Sequential(TorchBasicBlock(d1, d2, 2),
                                    TorchBasicBlock(d2, d2, 1))
        self.layer3 = nn.Sequential(TorchBasicBlock(d2, d3, 2),
                                    TorchBasicBlock(d3, d3, 1))
        self.layer3_outconv = nn.Conv2d(d3, d3, 1, bias=False)
        self.layer2_outconv = nn.Conv2d(d2, d3, 1, bias=False)
        self.layer2_outconv2 = nn.Sequential(
            nn.Conv2d(d3, d3, 3, 1, 1, bias=False), nn.BatchNorm2d(d3),
            nn.LeakyReLU(), nn.Conv2d(d3, d2, 3, 1, 1, bias=False))
        self.layer1_outconv = nn.Conv2d(d1, d2, 1, bias=False)
        self.layer1_outconv2 = nn.Sequential(
            nn.Conv2d(d2, d2, 3, 1, 1, bias=False), nn.BatchNorm2d(d2),
            nn.LeakyReLU(), nn.Conv2d(d2, d1, 3, 1, 1, bias=False))

    def forward(self, x):
        x0 = F.relu(self.bn1(self.conv1(x)))
        x1 = self.layer1(x0)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x3_out = self.layer3_outconv(x3)
        x2_out = self.layer2_outconv(x2)
        x3_up = F.interpolate(x3_out, size=x2_out.shape[2:], mode="bilinear",
                              align_corners=True)
        x2_out = self.layer2_outconv2(x2_out + x3_up)
        x1_out = self.layer1_outconv(x1)
        x2_up = F.interpolate(x2_out, size=x1_out.shape[2:], mode="bilinear",
                              align_corners=True)
        x1_out = self.layer1_outconv2(x1_out + x2_up)
        return x3_out, x1_out


def test_backbone_parity_via_converter():
    torch.manual_seed(1)
    tb = TorchResNetFPN().eval()
    sd = {f"backbone.{k}": v.detach().numpy()
          for k, v in tb.state_dict().items()}
    params, stats = {}, {}
    _convert_backbone(params, stats, sd)

    model = ResNetFPN(initial_dim=8, block_dims=(8, 12, 16))
    rng = np.random.default_rng(1)
    x = rng.random((1, 32, 40, 1)).astype(np.float32)
    with torch.no_grad():
        ref_c, ref_f = tb(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ours_c, ours_f = model.apply(
        {"params": params["backbone"], "batch_stats": stats["backbone"]},
        jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(ours_c), np.transpose(ref_c.numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ours_f), np.transpose(ref_f.numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=1e-4)


def _full_reference_state_dict(rng):
    """Synthesize a complete reference-layout state_dict (correct shapes) to
    exercise every branch of the converter against the real model tree."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.05

    def bn(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)

    def lin(name, o, i, bias=False):
        sd[f"{name}.weight"] = rng.normal(size=(o, i)).astype(np.float32) * 0.05
        if bias:
            sd[f"{name}.bias"] = np.zeros(o, np.float32)

    def enc(prefix, d):
        for n in ("q_proj", "k_proj", "v_proj", "merge"):
            lin(f"{prefix}.{n}", d, d)
        lin(f"{prefix}.mlp.0", 2 * d, 2 * d)
        lin(f"{prefix}.mlp.2", d, 2 * d)
        for n in ("norm1", "norm2"):
            sd[f"{prefix}.{n}.weight"] = np.ones(d, np.float32)
            sd[f"{prefix}.{n}.bias"] = np.zeros(d, np.float32)

    d1, d2, d3 = 128, 196, 256
    conv("backbone.conv1", 128, 1, 7)
    bn("backbone.bn1", 128)
    dims = {1: (128, d1), 2: (d1, d2), 3: (d2, d3)}
    for li, (cin, cout) in dims.items():
        for bi in (0, 1):
            t = f"backbone.layer{li}.{bi}"
            c_in = cin if bi == 0 else cout
            conv(f"{t}.conv1", cout, c_in, 3)
            conv(f"{t}.conv2", cout, cout, 3)
            bn(f"{t}.bn1", cout)
            bn(f"{t}.bn2", cout)
            if bi == 0 and li > 1:
                conv(f"{t}.downsample.0", cout, cin, 1)
                bn(f"{t}.downsample.1", cout)
    conv("backbone.layer3_outconv", d3, d3, 1)
    conv("backbone.layer2_outconv", d3, d2, 1)
    conv("backbone.layer2_outconv2.0", d3, d3, 3)
    bn("backbone.layer2_outconv2.1", d3)
    conv("backbone.layer2_outconv2.3", d2, d3, 3)
    conv("backbone.layer1_outconv", d2, d1, 1)
    conv("backbone.layer1_outconv2.0", d2, d2, 3)
    bn("backbone.layer1_outconv2.1", d2)
    conv("backbone.layer1_outconv2.3", d1, d2, 3)

    for i in range(8):
        enc(f"matcher.loftr_coarse.layers.{i}", 256)  # test prefix strip too
    for i in range(4):
        enc(f"geo_module.des_transformer.layers.{i}", 256)
    for i in range(2):
        enc(f"loftr_fine.layers.{i}", 128)
    lin("fine_preprocess.down_proj", 128, 256, bias=True)
    lin("fine_preprocess.merge_feat", 128, 256, bias=True)
    return sd


@pytest.mark.slow
def test_full_checkpoint_conversion_loads_and_runs():
    from geoformer_tpu.config import (
        GeoFormerConfig,
        GeoModuleConfig,
        MatchConfig,
    )
    from geoformer_tpu.models import GeoFormer
    from geoformer_tpu.utils.torch_convert import convert_state_dict

    rng = np.random.default_rng(9)
    sd = _full_reference_state_dict(rng)
    variables = convert_state_dict(sd)

    cfg = GeoFormerConfig(
        match=MatchConfig(max_matches=32),
        geo=GeoModuleConfig(ransac_iters=32, max_inliers=32),
    )
    model = GeoFormer(cfg)
    img = jnp.asarray(rng.random((1, 64, 80, 1)), jnp.float32)
    # structural check: converted tree must match the model's init tree
    init = model.init({"params": jax.random.key(0),
                       "ransac": jax.random.key(0)}, img, img)

    def paths(tree, prefix=()):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= paths(v, prefix + (k,))
            else:
                out.add(prefix + (k, getattr(v, "shape", None) and tuple(v.shape)))
        return out

    p_init = paths(init["params"])
    p_conv = paths(variables["params"])
    missing = p_init - p_conv
    extra = p_conv - p_init
    assert not missing, f"converter missing params: {sorted(missing)[:5]}"
    assert not extra, f"converter extra params: {sorted(extra)[:5]}"

    out = model.apply(variables, img, img, rngs={"ransac": jax.random.key(1)})
    assert np.isfinite(np.asarray(out.fine.mkpts0)).all()


def test_to_torch_state_dict_roundtrip():
    """flax -> torch names -> flax must be the identity (the parity drill's
    fabricated checkpoints depend on it)."""
    from geoformer_tpu.utils.torch_convert import (
        convert_state_dict,
        to_torch_state_dict,
    )

    rng = np.random.default_rng(3)
    sd0 = _full_reference_state_dict(rng)
    variables = convert_state_dict(sd0)
    sd1 = to_torch_state_dict(variables)
    # every original key appears ('matcher.'-prefixed, normalizing the mixed
    # prefixes the fabricated dict uses) with identical values
    norm = {("" if k.startswith("matcher.") else "matcher.") + k: v
            for k, v in sd0.items()}
    assert set(sd1) == set(norm)
    for k, v in norm.items():
        np.testing.assert_allclose(sd1[k], np.asarray(v),
                                   rtol=0, atol=0, err_msg=k)
    # and converting back reproduces the flax tree exactly
    variables2 = convert_state_dict(
        {k: np.asarray(v) for k, v in sd1.items()})
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(variables2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
