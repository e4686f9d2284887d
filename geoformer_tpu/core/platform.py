"""Workaround for the axon PJRT plugin hijacking platform selection.

The TPU tunnel plugin registers itself in a way that overrides the
``JAX_PLATFORMS`` environment variable: a process launched with
``JAX_PLATFORMS=cpu`` still gets the TPU as its default backend. That is
worse than an inconvenience here — the tunnel is single-client, so a
"CPU" subprocess silently landing on it contends with (or hangs) whatever
is mid-flight there.

``respect_platform_env()`` re-applies the env var through ``jax.config``
(which the plugin cannot override) for the platforms jax always knows
about. Call it at the top of every entry point BEFORE the first jax
backend use. A no-op when the env var is unset or names the TPU plugin.
"""

from __future__ import annotations

import os

import jax

_HONORED = ("cpu",)


def respect_platform_env() -> None:
    want = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if want in _HONORED:
        try:
            jax.config.update("jax_platforms", want)
        except RuntimeError:
            pass  # backend already initialized; too late to switch


def force_cpu() -> None:
    """Pin this process to the host platform (used by the multichip dryrun,
    whose contract is N virtual CPU devices via xla_force_host_platform)."""
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
