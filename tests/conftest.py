"""Test config: force an 8-device virtual CPU platform BEFORE jax initializes.

This stands in for a TPU pod slice (SURVEY.md §4): all sharding/collective
tests run on the host mesh, as the driver's dryrun does.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any ambient TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Plugins (e.g. jaxtyping's pytest hook) import jax before this conftest runs,
# which freezes the ambient JAX_PLATFORMS (possibly a TPU tunnel) into
# jax.config — so setting the env var above is not enough. Override the config
# directly; the backend is not initialized until first use, so this wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: repeated test runs skip recompilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
