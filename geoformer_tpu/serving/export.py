"""AOT export / serving: the matcher as a self-contained StableHLO bundle.

The reference framework has no deployment story — serving it means shipping
the whole PyTorch + Lightning + cv2 stack and paying eager-mode dispatch per
pair. The TPU-native equivalent is ahead-of-time lowering: `jax.export`
lowers the full matcher forward (backbone -> coarse transformer -> GAM ->
fine matching, reference model/full_model.py:39-123) to a versioned StableHLO
program once, at a fixed (batch, H, W); the resulting bundle

    manifest.json   shapes, dtypes, platforms, config summary
    model.shlo      serialized `jax.export.Exported`
    params.pkl      weights + batch_stats (numpy pytree)

reloads with `load_bundle` in a process that imports ONLY jax + numpy — no
flax, no model code, no config tree — and runs on any of the lowered
platforms. Export on the serving platform to let the Pallas kernels engage
(kernel dispatch is resolved at trace time from the host backend; exporting
on CPU produces the portable XLA-only graph).
"""

from __future__ import annotations

import dataclasses
import io
import json
import pickle
import zipfile
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BUNDLE_VERSION = 1


def _forward_fn(model):
    """The serving forward: plain dict out, fixed RANSAC stream.

    A dict (not the internal NamedTuple pytrees) keeps the artifact's
    calling convention independent of this package's classes, so bundles
    stay loadable across refactors.
    """

    def fwd(variables, image0, image1, mask0, mask1):
        out = model.apply(variables, image0, image1, mask0=mask0,
                          mask1=mask1, rngs={"ransac": jax.random.key(0)})
        return {
            "mkpts0": out.fine.mkpts0,
            "mkpts1": out.fine.mkpts1,
            "mconf": out.fine.mconf,
            "valid": out.fine.valid,
        }

    return fwd


def export_matcher(cfg, variables, *, hw: Tuple[int, int], batch: int = 1,
                   platforms: Optional[Sequence[str]] = None):
    """Lower the matcher to a `jax.export.Exported` at fixed shapes.

    Args:
        cfg: GeoFormerConfig (capacities/kernels/dtype are baked in).
        variables: {'params': ..., 'batch_stats': ...} as trained.
        hw: input image (height, width); must be divisible by the coarse
            stride.
        batch: pairs per call (static, like every shape under XLA).
        platforms: lowering targets, e.g. ("tpu", "cpu"). Default: the
            current backend.
    """
    from geoformer_tpu.models import GeoFormer

    h, w = hw
    s = cfg.coarse_scale
    if h % s or w % s:
        raise ValueError(f"hw {hw} not divisible by coarse stride {s}")
    fwd = _forward_fn(GeoFormer(cfg))
    img = jax.ShapeDtypeStruct((batch, h, w, 1), jnp.float32)
    msk = jax.ShapeDtypeStruct((batch, h // s, w // s), jnp.float32)
    var_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        variables)
    kwargs = {} if platforms is None else {"platforms": tuple(platforms)}
    return jax.export.export(jax.jit(fwd), **kwargs)(
        var_specs, img, img, msk, msk)


def save_bundle(path: str, cfg, variables, *, hw: Tuple[int, int],
                batch: int = 1,
                platforms: Optional[Sequence[str]] = None) -> None:
    """Export + write the self-contained serving zip at ``path``."""
    exported = export_matcher(cfg, variables, hw=hw, batch=batch,
                              platforms=platforms)
    manifest = {
        "bundle_version": BUNDLE_VERSION,
        "batch": batch,
        "hw": list(hw),
        "coarse_scale": cfg.coarse_scale,
        "platforms": list(exported.platforms),
        "max_matches": cfg.match.max_matches,
        "config": dataclasses.asdict(cfg),
    }
    host_vars = jax.tree.map(lambda x: np.asarray(jax.device_get(x)),
                             variables)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("manifest.json", json.dumps(manifest, indent=1,
                                               default=str))
        z.writestr("model.shlo", exported.serialize())
        buf = io.BytesIO()
        pickle.dump(host_vars, buf)
        z.writestr("params.pkl", buf.getvalue())


class ServingMatcher:
    """A loaded bundle: callable, model-code-free.

    __call__(image0, image1[, mask0, mask1]) with [B, H, W, 1] float32
    images in [0, 1] (B, H, W fixed by the bundle) returns numpy
    {"mkpts0", "mkpts1", "mconf", "valid"}; filter keypoints by "valid".
    """

    def __init__(self, exported, variables, manifest: dict):
        self._exported = exported
        self._vars = variables
        self.manifest = manifest
        self.batch = int(manifest["batch"])
        self.hw = tuple(manifest["hw"])
        self._scale = int(manifest["coarse_scale"])

    def __call__(self, image0, image1, mask0=None, mask1=None):
        b, (h, w), s = self.batch, self.hw, self._scale
        if mask0 is None:
            mask0 = jnp.ones((b, h // s, w // s), jnp.float32)
        if mask1 is None:
            mask1 = jnp.ones((b, h // s, w // s), jnp.float32)
        out = self._exported.call(self._vars, jnp.asarray(image0),
                                  jnp.asarray(image1), jnp.asarray(mask0),
                                  jnp.asarray(mask1))
        return {k: np.asarray(v) for k, v in out.items()}


def _prime_ffi_registration() -> None:
    """Work around a jaxlib-0.9 CPU crash on deserialized custom calls.

    The matcher graph contains LAPACK custom calls (the RANSAC DLT solve
    uses eigh). A process that deserializes the Exported WITHOUT ever
    having traced a linalg op itself segfaults inside ``Exported.call`` —
    the CPU FFI targets are only registered when jax first lowers such an
    op. Tracing one tiny eigh registers every LAPACK target. (Verified:
    exported eigh -> fresh-process call -> SIGSEGV; with this priming ->
    ok. TPU backends carry no LAPACK custom calls, so skip there.)
    """
    if jax.default_backend() == "cpu":
        jax.jit(lambda m: jnp.linalg.eigh(m)[0])(
            jnp.eye(3, dtype=jnp.float32)).block_until_ready()


def load_bundle(path: str) -> ServingMatcher:
    _prime_ffi_registration()
    with zipfile.ZipFile(path) as z:
        manifest = json.loads(z.read("manifest.json"))
        if manifest["bundle_version"] > BUNDLE_VERSION:
            raise ValueError(f"bundle version {manifest['bundle_version']} "
                             f"is newer than this loader ({BUNDLE_VERSION})")
        exported = jax.export.deserialize(z.read("model.shlo"))
        variables = pickle.loads(z.read("params.pkl"))
    return ServingMatcher(exported, variables, manifest)
