"""Fast smoke tier anchors: one sharding test and one reference-parity test.

The heavy 8-device train/eval-loop modules are marked `slow`; this file
guarantees the `pytest -m "not slow"` tier still exercises (a) a real
multi-device pjit collective on the virtual mesh, and (b) a torch-vs-jax
numerical parity check against the reference's own attention math
(reference: model/loftr_src/loftr_module/linear_attention.py:15-51).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_sharded_psum_on_virtual_mesh():
    """A pjit-sharded computation with a psum runs on all 8 CPU devices."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.array(jax.devices())
    assert len(devices) == 8, "conftest must force 8 virtual devices"
    mesh = Mesh(devices, ("data",))

    @jax.jit
    def step(x):
        local = jnp.sum(x ** 2, axis=-1)
        return jax.lax.with_sharding_constraint(
            local, NamedSharding(mesh, P("data")))

    x = jax.device_put(
        jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4),
        NamedSharding(mesh, P("data")))
    out = step(x)
    np.testing.assert_allclose(
        np.asarray(out), (np.arange(32, dtype=np.float32).reshape(8, 4) ** 2
                          ).sum(-1), rtol=1e-6)
    assert len(out.sharding.device_set) == 8


def test_linear_attention_matches_reference_math():
    """Our linear attention == the reference's elu(x)+1 formulation in torch.

    Small shapes so the whole test (incl. torch import) stays in the smoke
    budget.
    """
    torch = pytest.importorskip("torch")

    from geoformer_tpu.ops.attention import linear_attention

    rng = np.random.default_rng(0)
    B, L, S, H, D = 2, 16, 24, 4, 8
    q = rng.standard_normal((B, L, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)

    ours = np.asarray(linear_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))

    # Reference math (linear_attention.py:21-51): feature map elu(.)+1,
    # KV aggregation, /v_length normalization inside, 1e-6 guard.
    tq, tk, tv = (torch.from_numpy(a) for a in (q, k, v))
    Q = torch.nn.functional.elu(tq) + 1
    K = torch.nn.functional.elu(tk) + 1
    v_length = tv.size(1)
    values = tv / v_length
    KV = torch.einsum("nshd,nshv->nhdv", K, values)
    Z = 1 / (torch.einsum("nlhd,nhd->nlh", Q, K.sum(dim=1)) + 1e-6)
    ref = torch.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * v_length

    np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-5, atol=2e-5)
