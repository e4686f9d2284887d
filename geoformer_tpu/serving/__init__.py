"""AOT export / serving bundles (StableHLO via jax.export)."""

from geoformer_tpu.serving.export import (  # noqa: F401
    ServingMatcher,
    export_matcher,
    load_bundle,
    save_bundle,
)
