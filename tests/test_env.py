"""Guard: tests must run on the virtual CPU mesh, never a live accelerator."""

import jax


def test_backend_is_cpu_with_8_devices():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8
