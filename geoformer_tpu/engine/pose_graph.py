"""Pose-graph optimization over SE(3) (Gauss-Newton, jit-compiled).

Engine-layer component: pairwise relative-pose measurements (from matching +
pose recovery, or odometry chaining) are fused into globally consistent
keyframe poses. Residual per edge (i, j): log(T_ij_meas^-1 @ T_j @ T_i^-1),
minimized over left-multiplied local updates; node 0 is gauge-fixed.
Jacobians come from forward-mode autodiff; the normal system is dense
[6K, 6K] (keyframe counts are engine-scale, not map-scale).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from geoformer_tpu.engine.lie import se3_exp, se3_log


class PoseGraph(NamedTuple):
    poses: jax.Array      # [K, 4, 4] world->keyframe
    edge_i: jax.Array     # [E] int32
    edge_j: jax.Array     # [E] int32
    edge_T: jax.Array     # [E, 4, 4] measured T_itoj (cam_j @ cam_i^-1)
    edge_valid: jax.Array  # [E] bool
    edge_weight: jax.Array  # [E] float


def _edge_residual(xi_i, xi_j, Ti, Tj, Tij):
    Ti_new = se3_exp(xi_i) @ Ti
    Tj_new = se3_exp(xi_j) @ Tj
    return se3_log(jnp.linalg.inv(Tij) @ Tj_new @ jnp.linalg.inv(Ti_new))


@partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(graph: PoseGraph, iters: int = 10,
                        damping: float = 1e-6):
    """Returns (poses, residual_norm_history)."""
    K = graph.poses.shape[0]
    hp = jax.lax.Precision.HIGHEST

    def step(poses, _):
        Ti = poses[graph.edge_i]
        Tj = poses[graph.edge_j]

        def per_edge(Ti, Tj, Tij):
            z6 = jnp.zeros(6)
            r = _edge_residual(z6, z6, Ti, Tj, Tij)
            Ji = jax.jacfwd(_edge_residual, argnums=0)(z6, z6, Ti, Tj, Tij)
            Jj = jax.jacfwd(_edge_residual, argnums=1)(z6, z6, Ti, Tj, Tij)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(per_edge)(Ti, Tj, graph.edge_T)
        w = (graph.edge_valid.astype(r.dtype) * graph.edge_weight)[:, None]
        r = r * w
        Ji = Ji * w[..., None]
        Jj = Jj * w[..., None]

        # Assemble dense H [K*6, K*6], b [K*6] with segment sums.
        def acc(H, b, Ja, Jb, ia, ib):
            Hij = jnp.einsum("eri,erj->eij", Ja, Jb, precision=hp)
            idx = ia * K + ib
            H = H + jax.ops.segment_sum(Hij, idx, K * K)
            return H, b

        H = jnp.zeros((K * K, 6, 6))
        b = jnp.zeros((K, 6))
        H, _ = acc(H, b, Ji, Ji, graph.edge_i, graph.edge_i)
        H, _ = acc(H, b, Ji, Jj, graph.edge_i, graph.edge_j)
        H, _ = acc(H, b, Jj, Ji, graph.edge_j, graph.edge_i)
        H, _ = acc(H, b, Jj, Jj, graph.edge_j, graph.edge_j)
        b = b - jax.ops.segment_sum(
            jnp.einsum("eri,er->ei", Ji, r, precision=hp), graph.edge_i, K)
        b = b - jax.ops.segment_sum(
            jnp.einsum("eri,er->ei", Jj, r, precision=hp), graph.edge_j, K)

        Hm = H.reshape(K, K, 6, 6).transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
        Hm = Hm + damping * jnp.eye(K * 6)
        # gauge fix node 0
        mask = jnp.arange(K * 6) >= 6
        Hm = jnp.where(mask[:, None] & mask[None, :], Hm, 0.0)
        Hm = Hm + jnp.diag(jnp.where(mask, 0.0, 1.0))
        bm = jnp.where(mask, b.reshape(-1), 0.0)

        dx = jnp.linalg.solve(Hm, bm).reshape(K, 6)
        poses = jax.vmap(lambda xi, T: se3_exp(xi) @ T)(dx, poses)
        return poses, jnp.linalg.norm(r)

    with jax.default_matmul_precision("highest"):
        poses, hist = jax.lax.scan(step, graph.poses, None, length=iters)
    return poses, hist
