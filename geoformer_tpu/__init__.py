"""GeoFormer-TPU: a TPU-native detector-free image matching + homography framework.

A from-scratch JAX/Pallas/pjit re-design of the capabilities of
ruc-aimc-lab/GeoFormer (ICCV 2023, "Geometrized Transformer for Self-Supervised
Homography Estimation"): ResNet-FPN features, linear-attention coarse
transformer, dual-softmax matching, a RANSAC-seeded geometrized attention
module (GAM) running fully on-device, and window fine matching — plus training,
evaluation (HPatches/FIRE/ISC-HE), and multi-chip scaling via jax.sharding.

Everything is fixed-shape and jit-compatible: dynamic match sets become
capacity-padded tensors with validity masks, and the reference's mid-forward
CPU RANSAC (reference: model/geo_module.py:48) becomes a batched, vmapped
hypothesis-sampling RANSAC on the accelerator.
"""

__version__ = "0.1.0"

from geoformer_tpu.config import GeoFormerConfig  # noqa: F401
