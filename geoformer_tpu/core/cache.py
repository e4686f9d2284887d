"""Persistent XLA compilation cache.

First compiles of the full model take tens of seconds (CPU: minutes); the
persistent cache makes every subsequent process start warm. Call once before
the first jit execution.
"""

from __future__ import annotations

import os

import jax


def enable_compile_cache(path: str | None = None) -> None:
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  "/tmp/jax_geoformer_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
