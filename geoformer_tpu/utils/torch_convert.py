"""Torch checkpoint -> JAX parameter converter.

Maps the reference's state_dict layout (reference: model/full_model.py module
tree; ckpt keys optionally 'matcher.'-prefixed, full_model.py:125-129) onto
this framework's flax parameter/batch-stats pytrees, so released GeoFormer
checkpoints can be evaluated for numerical parity.

Layout conventions converted:
    conv:   torch [O, I, kh, kw]  -> flax [kh, kw, I, O]
    linear: torch [O, I]          -> flax [I, O]
    batchnorm: weight/bias -> scale/bias; running stats -> batch_stats.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _lin(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value, np.float32)


def _convert_conv(params, sd, tpath, jpath):
    _set(params, jpath + ("kernel",), _conv(sd[tpath + ".weight"]))
    if tpath + ".bias" in sd:
        _set(params, jpath + ("bias",), sd[tpath + ".bias"])


def _convert_bn(params, stats, sd, tpath, jpath):
    _set(params, jpath + ("scale",), sd[tpath + ".weight"])
    _set(params, jpath + ("bias",), sd[tpath + ".bias"])
    _set(stats, jpath + ("mean",), sd[tpath + ".running_mean"])
    _set(stats, jpath + ("var",), sd[tpath + ".running_var"])


def _convert_linear(params, sd, tpath, jpath):
    _set(params, jpath + ("kernel",), _lin(sd[tpath + ".weight"]))
    if tpath + ".bias" in sd:
        _set(params, jpath + ("bias",), sd[tpath + ".bias"])


def _convert_layernorm(params, sd, tpath, jpath):
    _set(params, jpath + ("scale",), sd[tpath + ".weight"])
    _set(params, jpath + ("bias",), sd[tpath + ".bias"])


def _convert_encoder_layer(params, sd, tprefix, jprefix):
    """LoFTREncoderLayer (reference: loftr_module/transformer.py:9-35 /
    geo_transformer/transformer.py:10-37)."""
    for name in ("q_proj", "k_proj", "v_proj", "merge"):
        _convert_linear(params, sd, f"{tprefix}.{name}", jprefix + (name,))
    _convert_linear(params, sd, f"{tprefix}.mlp.0", jprefix + ("mlp0",))
    _convert_linear(params, sd, f"{tprefix}.mlp.2", jprefix + ("mlp1",))
    _convert_layernorm(params, sd, f"{tprefix}.norm1", jprefix + ("norm1",))
    _convert_layernorm(params, sd, f"{tprefix}.norm2", jprefix + ("norm2",))


def _convert_backbone(params, stats, sd):
    if "backbone.layer4.0.conv1.weight" in sd:
        return _convert_backbone_16_4(params, stats, sd)
    p = ("backbone",)
    _convert_conv(params, sd, "backbone.conv1", p + ("conv1",))
    _convert_bn(params, stats, sd, "backbone.bn1", p + ("bn1",))
    for li in (1, 2, 3):
        for bi in (0, 1):
            t = f"backbone.layer{li}.{bi}"
            j = p + (f"layer{li}_{bi}",)
            _convert_conv(params, sd, f"{t}.conv1", j + ("conv1",))
            _convert_conv(params, sd, f"{t}.conv2", j + ("conv2",))
            _convert_bn(params, stats, sd, f"{t}.bn1", j + ("bn1",))
            _convert_bn(params, stats, sd, f"{t}.bn2", j + ("bn2",))
            if f"{t}.downsample.0.weight" in sd:
                _convert_conv(params, sd, f"{t}.downsample.0",
                              j + ("conv_down",))
                _convert_bn(params, stats, sd, f"{t}.downsample.1",
                            j + ("bn_down",))
    # FPN (resnet_fpn.py:66-82)
    _convert_conv(params, sd, "backbone.layer3_outconv", p + ("l3_out",))
    _convert_conv(params, sd, "backbone.layer2_outconv", p + ("l2_out",))
    _convert_conv(params, sd, "backbone.layer2_outconv2.0", p + ("l2_m1",))
    _convert_bn(params, stats, sd, "backbone.layer2_outconv2.1", p + ("l2_bn",))
    _convert_conv(params, sd, "backbone.layer2_outconv2.3", p + ("l2_m2",))
    _convert_conv(params, sd, "backbone.layer1_outconv", p + ("l1_out",))
    _convert_conv(params, sd, "backbone.layer1_outconv2.0", p + ("l1_m1",))
    _convert_bn(params, stats, sd, "backbone.layer1_outconv2.1", p + ("l1_bn",))
    _convert_conv(params, sd, "backbone.layer1_outconv2.3", p + ("l1_m2",))


def _convert_backbone_16_4(params, stats, sd):
    """ResNetFPN_16_4 layout (reference: backbone/resnet_fpn.py:121-199):
    four residual stages; FPN from 1/16 down to 1/4 only."""
    p = ("backbone",)
    _convert_conv(params, sd, "backbone.conv1", p + ("conv1",))
    _convert_bn(params, stats, sd, "backbone.bn1", p + ("bn1",))
    for li in (1, 2, 3, 4):
        for bi in (0, 1):
            t = f"backbone.layer{li}.{bi}"
            j = p + (f"layer{li}_{bi}",)
            _convert_conv(params, sd, f"{t}.conv1", j + ("conv1",))
            _convert_conv(params, sd, f"{t}.conv2", j + ("conv2",))
            _convert_bn(params, stats, sd, f"{t}.bn1", j + ("bn1",))
            _convert_bn(params, stats, sd, f"{t}.bn2", j + ("bn2",))
            if f"{t}.downsample.0.weight" in sd:
                _convert_conv(params, sd, f"{t}.downsample.0",
                              j + ("conv_down",))
                _convert_bn(params, stats, sd, f"{t}.downsample.1",
                            j + ("bn_down",))
    _convert_conv(params, sd, "backbone.layer4_outconv", p + ("l4_out",))
    _convert_conv(params, sd, "backbone.layer3_outconv", p + ("l3_out",))
    _convert_conv(params, sd, "backbone.layer3_outconv2.0", p + ("l3_m1",))
    _convert_bn(params, stats, sd, "backbone.layer3_outconv2.1", p + ("l3_bn",))
    _convert_conv(params, sd, "backbone.layer3_outconv2.3", p + ("l3_m2",))
    _convert_conv(params, sd, "backbone.layer2_outconv", p + ("l2_out",))
    _convert_conv(params, sd, "backbone.layer2_outconv2.0", p + ("l2_m1",))
    _convert_bn(params, stats, sd, "backbone.layer2_outconv2.1", p + ("l2_bn",))
    _convert_conv(params, sd, "backbone.layer2_outconv2.3", p + ("l2_m2",))


def convert_state_dict(sd: Dict[str, "np.ndarray"],
                       n_coarse_layers: int = 8,
                       n_geo_layers: int = 4,
                       n_fine_layers: int = 2) -> Dict:
    """Convert a (numpy-valued) reference state_dict to flax variables.

    Returns {'params': ..., 'batch_stats': ...} trees ready for
    GeoFormer.apply.
    """
    # strip the 'matcher.' training prefix (full_model.py:125-129)
    sd = {(k[len("matcher."):] if k.startswith("matcher.") else k): v
          for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}
    _convert_backbone(params, stats, sd)
    for i in range(n_coarse_layers):
        _convert_encoder_layer(params, sd, f"loftr_coarse.layers.{i}",
                               ("loftr_coarse", f"layer_{i}"))
    for i in range(n_geo_layers):
        _convert_encoder_layer(params, sd,
                               f"geo_module.des_transformer.layers.{i}",
                               ("geo_module", f"layer_{i}"))
    for i in range(n_fine_layers):
        _convert_encoder_layer(params, sd, f"loftr_fine.layers.{i}",
                               ("loftr_fine", f"layer_{i}"))
    _convert_linear(params, sd, "fine_preprocess.down_proj",
                    ("fine_preprocess", "down_proj"))
    _convert_linear(params, sd, "fine_preprocess.merge_feat",
                    ("fine_preprocess", "merge_feat"))
    return {"params": params, "batch_stats": stats}


def _get(tree: Dict, path: Tuple[str, ...]):
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node)


def _rev_conv(sd, params, tpath, jpath):
    sd[tpath + ".weight"] = np.transpose(_get(params, jpath + ("kernel",)),
                                         (3, 2, 0, 1))
    try:
        sd[tpath + ".bias"] = _get(params, jpath + ("bias",))
    except KeyError:
        pass


def _rev_bn(sd, params, stats, tpath, jpath):
    sd[tpath + ".weight"] = _get(params, jpath + ("scale",))
    sd[tpath + ".bias"] = _get(params, jpath + ("bias",))
    sd[tpath + ".running_mean"] = _get(stats, jpath + ("mean",))
    sd[tpath + ".running_var"] = _get(stats, jpath + ("var",))


def _rev_linear(sd, params, tpath, jpath):
    sd[tpath + ".weight"] = np.transpose(_get(params, jpath + ("kernel",)))
    try:
        sd[tpath + ".bias"] = _get(params, jpath + ("bias",))
    except KeyError:
        pass


def _rev_layernorm(sd, params, tpath, jpath):
    sd[tpath + ".weight"] = _get(params, jpath + ("scale",))
    sd[tpath + ".bias"] = _get(params, jpath + ("bias",))


def _rev_encoder_layer(sd, params, tprefix, jprefix):
    for name in ("q_proj", "k_proj", "v_proj", "merge"):
        _rev_linear(sd, params, f"{tprefix}.{name}", jprefix + (name,))
    _rev_linear(sd, params, f"{tprefix}.mlp.0", jprefix + ("mlp0",))
    _rev_linear(sd, params, f"{tprefix}.mlp.2", jprefix + ("mlp1",))
    _rev_layernorm(sd, params, f"{tprefix}.norm1", jprefix + ("norm1",))
    _rev_layernorm(sd, params, f"{tprefix}.norm2", jprefix + ("norm2",))


def to_torch_state_dict(variables: Dict,
                        n_coarse_layers: int = 8,
                        n_geo_layers: int = 4,
                        n_fine_layers: int = 2,
                        prefix: str = "matcher.") -> Dict[str, np.ndarray]:
    """Inverse of convert_state_dict: flax variables -> reference-named
    state_dict (numpy values, '.weight' layouts transposed back).

    Lets TPU-trained weights run under the reference's own torch tooling,
    and fabricates drill checkpoints for `cli parity` rehearsals.
    Only the (8, 2) backbone layout is covered (the released model's).
    """
    params, stats = variables["params"], variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    p = ("backbone",)
    _rev_conv(sd, params, "backbone.conv1", p + ("conv1",))
    _rev_bn(sd, params, stats, "backbone.bn1", p + ("bn1",))
    for li in (1, 2, 3):
        for bi in (0, 1):
            t = f"backbone.layer{li}.{bi}"
            j = p + (f"layer{li}_{bi}",)
            _rev_conv(sd, params, f"{t}.conv1", j + ("conv1",))
            _rev_conv(sd, params, f"{t}.conv2", j + ("conv2",))
            _rev_bn(sd, params, stats, f"{t}.bn1", j + ("bn1",))
            _rev_bn(sd, params, stats, f"{t}.bn2", j + ("bn2",))
            if "conv_down" in params["backbone"].get(f"layer{li}_{bi}", {}):
                _rev_conv(sd, params, f"{t}.downsample.0", j + ("conv_down",))
                _rev_bn(sd, params, stats, f"{t}.downsample.1",
                        j + ("bn_down",))
    _rev_conv(sd, params, "backbone.layer3_outconv", p + ("l3_out",))
    _rev_conv(sd, params, "backbone.layer2_outconv", p + ("l2_out",))
    _rev_conv(sd, params, "backbone.layer2_outconv2.0", p + ("l2_m1",))
    _rev_bn(sd, params, stats, "backbone.layer2_outconv2.1", p + ("l2_bn",))
    _rev_conv(sd, params, "backbone.layer2_outconv2.3", p + ("l2_m2",))
    _rev_conv(sd, params, "backbone.layer1_outconv", p + ("l1_out",))
    _rev_conv(sd, params, "backbone.layer1_outconv2.0", p + ("l1_m1",))
    _rev_bn(sd, params, stats, "backbone.layer1_outconv2.1", p + ("l1_bn",))
    _rev_conv(sd, params, "backbone.layer1_outconv2.3", p + ("l1_m2",))
    for i in range(n_coarse_layers):
        _rev_encoder_layer(sd, params, f"loftr_coarse.layers.{i}",
                           ("loftr_coarse", f"layer_{i}"))
    for i in range(n_geo_layers):
        _rev_encoder_layer(sd, params,
                           f"geo_module.des_transformer.layers.{i}",
                           ("geo_module", f"layer_{i}"))
    for i in range(n_fine_layers):
        _rev_encoder_layer(sd, params, f"loftr_fine.layers.{i}",
                           ("loftr_fine", f"layer_{i}"))
    _rev_linear(sd, params, "fine_preprocess.down_proj",
                ("fine_preprocess", "down_proj"))
    _rev_linear(sd, params, "fine_preprocess.merge_feat",
                ("fine_preprocess", "merge_feat"))
    return {prefix + k: v for k, v in sd.items()}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .ckpt/.pth on CPU and return a numpy state_dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: v.detach().numpy() for k, v in ckpt.items()
            if hasattr(v, "detach")}
