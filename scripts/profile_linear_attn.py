"""Micro-benchmark: per-head vs flat-layout linear attention (fwd+bwd).

The [B, L, H, D] layouts put head_dim (16-32) in the lane dimension; the
flat variant (ops/attention.linear_attention_flat) keeps C = H*D in lanes.
Run on TPU to decide which backs EncoderLayer's linear branch.

    python scripts/profile_linear_attn.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    print(f"{label:<48} {(time.perf_counter() - t0) / iters * 1e3:8.2f} ms",
          flush=True)


def main():
    from geoformer_tpu.core.cache import enable_compile_cache
    from geoformer_tpu.core.platform import respect_platform_env

    respect_platform_env()
    enable_compile_cache()
    from geoformer_tpu.ops.attention import (
        linear_attention,
        linear_attention_flat,
    )

    rng = np.random.default_rng(0)
    for tag, b, l, c, h, dt in (
            ("coarse f32", 4, 4800, 256, 8, jnp.float32),
            ("coarse bf16", 4, 4800, 256, 8, jnp.bfloat16),
            ("fine bf16", 2048, 25, 128, 8, jnp.bfloat16),
    ):
        d = c // h
        q = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32), dt)
        k = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32), dt)
        v = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32), dt)

        def loss_split(q_, k_, v_):
            o = linear_attention(q_.reshape(b, l, h, d),
                                 k_.reshape(b, l, h, d),
                                 v_.reshape(b, l, h, d))
            return (jnp.asarray(o, jnp.float32) ** 2).sum()

        def loss_flat(q_, k_, v_):
            o = linear_attention_flat(q_, k_, v_, h)
            return (jnp.asarray(o, jnp.float32) ** 2).sum()

        g1 = jax.jit(jax.grad(loss_split))
        g2 = jax.jit(jax.grad(loss_flat))
        timeit(g1, q, k, v, label=f"{tag}: per-head fwd+bwd")
        timeit(g2, q, k, v, label=f"{tag}: flat fwd+bwd")


if __name__ == "__main__":
    main()
