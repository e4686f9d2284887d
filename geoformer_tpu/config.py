"""Typed, hashable configuration tree for GeoFormer-TPU.

Replaces the reference's three-tier yacs/argparse/yaml config stack
(reference: model/loftr_src/config/default.py:1-172, model/geo_config.py:9-19,
eval_configs/geoformer.yml:1-42) with frozen dataclasses that can be passed as
static jit arguments.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    """ResNet-FPN (reference: model/loftr_src/loftr/backbone/resnet_fpn.py:43-118)."""

    initial_dim: int = 128
    block_dims: Tuple[int, ...] = (128, 196, 256)  # stages at 1/2, 1/4, 1/8
    # output: coarse features at 1/8 (block_dims[-1] ch), fine at 1/2 (block_dims[0] ch)
    # (8, 2) ladder (default) or (16, 4) with 4 block_dims — must match
    # GeoFormerConfig.coarse_scale / fine_scale (resnet_fpn.py:121-199)
    resolution: Tuple[int, int] = (8, 2)
    # EVAL-ONLY dynamic int8 convs (ops/quantize.py): 2x MXU peak on v5e.
    # Params stay f32; checkpoints are unchanged. Asserts if used with
    # train=True (round() has no gradient).
    int8: bool = False


@dataclasses.dataclass(frozen=True)
class CoarseTransformerConfig:
    """Coarse LoFTR stack (reference: model/loftr_src/loftr/loftr_module/transformer.py:63-104)."""

    d_model: int = 256
    nhead: int = 8
    layer_names: Tuple[str, ...] = ("self", "cross") * 4
    attention: str = "linear"  # 'linear' | 'full'
    int8: bool = False  # eval-only dynamic int8 projections (ops/quantize)


@dataclasses.dataclass(frozen=True)
class FineTransformerConfig:
    """Fine LoFTR stack over window tokens (reference: config/default.py:39-44)."""

    d_model: int = 128
    nhead: int = 8
    layer_names: Tuple[str, ...] = ("self", "cross")
    # linear_flat = math-identical linear attention in [B, L, C] layout; at
    # the fine stack's 25-token windows it skips the head-split relayouts and
    # measures +6.7% end-to-end (bench 55.2 vs 51.7 pairs/s, RESULTS.md r4).
    # Measured SLOWER at coarse shapes, so only the fine default changes.
    attention: str = "linear_flat"
    int8: bool = False  # eval-only dynamic int8 projections (ops/quantize)


@dataclasses.dataclass(frozen=True)
class MatchConfig:
    """Coarse dual-softmax matching (reference: loftr/utils/coarse_matching.py:90-212).

    Note the reference constructor hard-overrides border_rm to 0
    (coarse_matching.py: `self.border_rm = 0`), so no border masking is applied.
    """

    thr: float = 0.2
    dsmax_temperature: float = 0.1
    match_type: str = "dual_softmax"  # 'dual_softmax' | 'sinkhorn'
    skh_iters: int = 3
    skh_init_bin_score: float = 1.0
    # Capacity for extracted coarse matches. <=0 means "dense": keep one slot per
    # coarse cell of image0 (exactly mirrors the reference, which keeps every
    # mutual-NN row above threshold).
    max_matches: int = -1
    force_one_match: bool = False  # training-time: guarantee >=1 match per pair
    # Streamed match extraction: never materialize the [B, L0, L1] conf
    # matrix (ops/fused_loss.streaming_match_extract). Automatically falls
    # back to the dense path when the dense conf is explicitly requested
    # (return_conf=True) or for the sinkhorn matcher.
    streaming_extract: bool = True


@dataclasses.dataclass(frozen=True)
class GeoModuleConfig:
    """Geometrized Attention Module (reference: model/geo_module.py:13-116,
    model/geo_config.py:9-19)."""

    nhead: int = 4
    layer_names: Tuple[str, ...] = ("self", "cross") * 2
    window_size: int = 5
    # On-device RANSAC (replaces cv2.findHomography(RANSAC, 8.0) at
    # geo_module.py:48): number of 4-point hypotheses and inlier threshold (px).
    ransac_iters: int = 512
    ransac_thr: float = 8.0
    min_matches: int = 8  # need > min_matches valid matches to fit H
    # Fixed capacity for the RANSAC-inlier KV set of the self-attention layers.
    max_inliers: int = 1024
    refine_iters: int = 2  # IRLS refinement rounds on inliers after best-H pick
    use_pallas: bool = False  # Pallas GAM kernels on TPU (box-window cross)
    # Masked-KV self-attention kernel specifically (requires use_pallas).
    # Wins in training (flash backward avoids the [L,S,H] logits residual);
    # measured ~5% slower than XLA's fused path on the eval forward.
    use_pallas_self: bool = True
    int8: bool = False  # eval-only dynamic int8 projections (ops/quantize)


@dataclasses.dataclass(frozen=True)
class FineMatchConfig:
    """Window-to-window fine matching (reference: model/fine_matching2.py:13-126)."""

    temperature: float = 0.1
    thr: float = 0.1
    window_size: int = 5
    concat_coarse_feat: bool = True


@dataclasses.dataclass(frozen=True)
class GeoFormerConfig:
    """Full-model config. Resolution ladder is fixed to (8, 2) as in the
    reference default (config/default.py: RESOLUTION = (8, 2))."""

    backbone: BackboneConfig = BackboneConfig()
    coarse: CoarseTransformerConfig = CoarseTransformerConfig()
    fine: FineTransformerConfig = FineTransformerConfig()
    match: MatchConfig = MatchConfig()
    geo: GeoModuleConfig = GeoModuleConfig()
    fine_match: FineMatchConfig = FineMatchConfig()
    coarse_scale: int = 8  # image -> coarse grid stride
    fine_scale: int = 2    # image -> fine grid stride
    # Compute dtype for matmul-heavy paths; params/statistics stay f32.
    use_bf16: bool = False
    # Sequence-parallel mesh axis: shard one pair's token/spatial dim over
    # this mesh axis for high-resolution matching (core/spmd.py). Requires
    # streaming extraction; jit under jax.sharding.set_mesh(mesh).
    seq_axis: "str | None" = None

    def replace(self, **kw) -> "GeoFormerConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """GeoLoss (reference: model/loftr_src/losses/loftr_loss.py:195-395)."""

    coarse_type: str = "focal"  # 'focal' | 'cross_entropy'
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    pos_weight: float = 1.0
    neg_weight: float = 1.0
    coarse_weight: float = 1.0
    fine_weight: float = 1.0
    sparse_spvs: bool = True  # matches reference default (MATCH_COARSE.SPARSE_SPVS)


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Optimizer/scheduler factory (reference: loftr_src/optimizers/__init__.py:5-42,
    LR scaling at lightning/train_homo_geoformer.py:80-86)."""

    optimizer: str = "adamw"
    canonical_lr: float = 6e-3
    canonical_bs: int = 64
    true_lr: float = 0.0  # 0 => derived: canonical_lr * world_bs / canonical_bs
    adamw_decay: float = 0.1
    warmup_steps: int = 4800       # canonical units (divided by LR scaling)
    warmup_actual: int = 0         # >0 => warmup in ACTUAL steps, no scaling
    warmup_ratio: float = 0.0
    scheduler: str = "multistep"  # 'multistep' | 'cosine' | 'exponential'
    mslr_milestones: Tuple[int, ...] = (3, 6, 9, 12)  # epochs
    mslr_gamma: float = 0.5
    cosa_tmax: int = 30
    elr_gamma: float = 0.999992
    gradient_clipping: float = 0.5


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    loss: LossConfig = LossConfig()
    optim: OptimConfig = OptimConfig()
    batch_size: int = 8            # global batch
    steps_per_epoch: int = 1000
    num_epochs: int = 15
    seed: int = 66
    image_hw: Tuple[int, int] = (480, 640)
    ckpt_dir: str = "checkpoints"
    log_every: int = 50
    ckpt_every_steps: int = 1000
