"""Log-domain Sinkhorn optimal transport (the reference's alternative coarse
matcher, kept for parity with the 'sinkhorn' MATCH_TYPE option).

Re-derivation of log_sinkhorn_iterations / log_optimal_transport (reference:
utils/common_utils.py:12-62, SuperGlue-style): a dustbin row/column with a
learned bin score, fixed iteration count, returns log-coupling scaled by M+N.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_sinkhorn(Z: jax.Array, log_mu: jax.Array, log_nu: jax.Array,
                 iters: int) -> jax.Array:
    """Sinkhorn normalization in log space. Z: [B, M, N]."""

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(Z + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(Z + u[:, :, None], axis=1)
        return u, v

    u = jnp.zeros_like(log_mu)
    v = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, iters, body, (u, v))
    return Z + u[:, :, None] + v[:, None, :]


def log_optimal_transport(scores: jax.Array, bin_score: jax.Array,
                          iters: int = 3) -> jax.Array:
    """Differentiable OT with dustbins. scores: [B, M, N] ->
    [B, M+1, N+1] log-coupling (multiplied by M+N as in the reference)."""
    b, m, n = scores.shape
    one = jnp.ones((), scores.dtype)
    ms, ns = one * m, one * n

    bins0 = jnp.full((b, m, 1), bin_score, scores.dtype)
    bins1 = jnp.full((b, 1, n), bin_score, scores.dtype)
    alpha = jnp.full((b, 1, 1), bin_score, scores.dtype)
    couplings = jnp.concatenate(
        [jnp.concatenate([scores, bins0], -1),
         jnp.concatenate([bins1, alpha], -1)], 1)            # [B, M+1, N+1]

    norm = -jnp.log(ms + ns)
    log_mu = jnp.concatenate(
        [jnp.full((m,), norm), jnp.log(ns)[None] + norm])
    log_nu = jnp.concatenate(
        [jnp.full((n,), norm), jnp.log(ms)[None] + norm])
    log_mu = jnp.broadcast_to(log_mu[None], (b, m + 1))
    log_nu = jnp.broadcast_to(log_nu[None], (b, n + 1))

    Z = log_sinkhorn(couplings, log_mu, log_nu, iters)
    return Z - norm
