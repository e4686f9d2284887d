"""SL(3) homography pose graph: globally consistent planar alignment.

For homography-world sequences (the reference's domain), keyframe states are
3x3 homographies to a reference frame. Pairwise measurements H_ij (from the
matcher + on-device RANSAC) are fused by Gauss-Newton over sl(3) tangent
updates: residual per edge = vee(log(H_ij^-1 @ H_j @ H_i^-1)) with the
matrix log approximated by the (normalized) deviation from identity —
accurate for the small residuals of a near-consistent graph and exact at the
optimum. Node 0 is gauge-fixed.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

# sl(3) basis: 8 traceless generators
_G = jnp.stack([
    jnp.array([[1, 0, 0], [0, -1, 0], [0, 0, 0]], jnp.float32),
    jnp.array([[0, 0, 0], [0, -1, 0], [0, 0, 1]], jnp.float32),
    jnp.array([[0, 1, 0], [0, 0, 0], [0, 0, 0]], jnp.float32),
    jnp.array([[0, 0, 0], [1, 0, 0], [0, 0, 0]], jnp.float32),
    jnp.array([[0, 0, 1], [0, 0, 0], [0, 0, 0]], jnp.float32),
    jnp.array([[0, 0, 0], [0, 0, 1], [0, 0, 0]], jnp.float32),
    jnp.array([[0, 0, 0], [0, 0, 0], [1, 0, 0]], jnp.float32),
    jnp.array([[0, 0, 0], [0, 0, 0], [0, 1, 0]], jnp.float32),
], axis=0)                                                  # [8, 3, 3]


def sl3_exp(xi: jax.Array) -> jax.Array:
    """[..., 8] -> [..., 3, 3] matrix exponential by scaling-and-squaring
    (8 squarings + 6-term series), accurate for pixel-scale translation
    generators (|A| up to ~100)."""
    A = jnp.einsum("...k,kij->...ij", xi, _G) / 256.0
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), A.shape)
    term = eye
    out = eye
    for i in range(1, 7):
        term = jnp.matmul(term, A) / i
        out = out + term
    for _ in range(8):
        out = jnp.matmul(out, out)
    return out


def _residual(xi_i, xi_j, Hi, Hj, Hij):
    """vee of the deviation of Hij^-1 Hj Hi^-1 from identity (normalized)."""
    Hi_new = sl3_exp(xi_i) @ Hi
    Hj_new = sl3_exp(xi_j) @ Hj
    M = jnp.linalg.inv(Hij) @ Hj_new @ jnp.linalg.inv(Hi_new)
    M = M * (3.0 / jnp.trace(M))          # scale-normalize (det ambiguity)
    D = M - jnp.eye(3, dtype=M.dtype)
    # project the deviation onto the sl(3) basis (first-order log)
    return jnp.array([
        (D[0, 0] - D[1, 1]) / 2, (D[2, 2] - D[1, 1]) / 2,
        D[0, 1], D[1, 0], D[0, 2], D[1, 2], D[2, 0], D[2, 1]])


class HomographyGraph(NamedTuple):
    H: jax.Array          # [K, 3, 3] frame -> reference homographies
    edge_i: jax.Array     # [E]
    edge_j: jax.Array     # [E]
    edge_H: jax.Array     # [E, 3, 3] measured H_itoj
    edge_valid: jax.Array
    edge_weight: jax.Array


@partial(jax.jit, static_argnames=("iters", "norm_scale"))
def optimize_homography_graph(graph: HomographyGraph, iters: int = 10,
                              damping: float = 1e-5,
                              norm_scale: float = 256.0):
    """Returns (H [K, 3, 3], residual_norm_history).

    All homographies are conjugated into a normalized frame (pixels /
    norm_scale) before optimization — without this the sl(3) tangent mixes
    pixel-scale translations with ~1e-6 perspective terms and Gauss-Newton
    diverges on the resulting conditioning.
    """
    K = graph.H.shape[0]
    hp = jax.lax.Precision.HIGHEST
    S = jnp.diag(jnp.array([1.0 / norm_scale, 1.0 / norm_scale, 1.0]))
    Sinv = jnp.diag(jnp.array([norm_scale, norm_scale, 1.0]))

    def unimodular(Hk):
        # measured homographies are h22-normalized with arbitrary det; bring
        # them onto SL(3) so tangent updates and residuals are consistent
        det = jnp.linalg.det(Hk)
        return Hk / jnp.cbrt(det)[..., None, None]

    graph = graph._replace(
        H=unimodular(jnp.einsum("ij,kjl,lm->kim", S, graph.H, Sinv)),
        edge_H=unimodular(jnp.einsum("ij,kjl,lm->kim", S, graph.edge_H,
                                     Sinv)))

    def step(H, _):
        Hi = H[graph.edge_i]
        Hj = H[graph.edge_j]

        def per_edge(Hi, Hj, Hij):
            z = jnp.zeros(8)
            r = _residual(z, z, Hi, Hj, Hij)
            Ji = jax.jacfwd(_residual, argnums=0)(z, z, Hi, Hj, Hij)
            Jj = jax.jacfwd(_residual, argnums=1)(z, z, Hi, Hj, Hij)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(per_edge)(Hi, Hj, graph.edge_H)
        w = (graph.edge_valid.astype(r.dtype) * graph.edge_weight)[:, None]
        r = r * w
        Ji = Ji * w[..., None]
        Jj = Jj * w[..., None]

        Hm = jnp.zeros((K * K, 8, 8))
        for Ja, Jb, ia, ib in ((Ji, Ji, graph.edge_i, graph.edge_i),
                               (Ji, Jj, graph.edge_i, graph.edge_j),
                               (Jj, Ji, graph.edge_j, graph.edge_i),
                               (Jj, Jj, graph.edge_j, graph.edge_j)):
            blocks = jnp.einsum("eri,erj->eij", Ja, Jb, precision=hp)
            Hm = Hm + jax.ops.segment_sum(blocks, ia * K + ib, K * K)
        b = -jax.ops.segment_sum(
            jnp.einsum("eri,er->ei", Ji, r, precision=hp), graph.edge_i, K)
        b = b - jax.ops.segment_sum(
            jnp.einsum("eri,er->ei", Jj, r, precision=hp), graph.edge_j, K)

        A = Hm.reshape(K, K, 8, 8).transpose(0, 2, 1, 3).reshape(K * 8, K * 8)
        A = A + damping * jnp.eye(K * 8)
        mask = jnp.arange(K * 8) >= 8
        A = jnp.where(mask[:, None] & mask[None, :], A, 0.0)
        A = A + jnp.diag(jnp.where(mask, 0.0, 1.0))
        bm = jnp.where(mask, b.reshape(-1), 0.0)

        dx = jnp.linalg.solve(A, bm).reshape(K, 8)
        H_new = jax.vmap(lambda xi, Hk: sl3_exp(xi) @ Hk)(dx, H)
        return H_new, jnp.linalg.norm(r)

    with jax.default_matmul_precision("highest"):
        H, hist = jax.lax.scan(step, graph.H, None, length=iters)
    H = jnp.einsum("ij,kjl,lm->kim", Sinv, H, S)   # back to pixel frame
    return H, hist
