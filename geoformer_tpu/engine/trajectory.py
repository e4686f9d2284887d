"""Trajectory alignment + ATE (absolute trajectory error).

Benchmark metric for the engine layer (BASELINE.json: "ATE on benchmark
sequences"). Umeyama similarity alignment followed by translation RMSE.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def align_umeyama(est: jax.Array, gt: jax.Array, with_scale: bool = True
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Least-squares similarity aligning est -> gt.

    Args:
        est, gt: [N, 3] camera centers.
    Returns:
        (s, R, t) with gt ~ s * R @ est + t.
    """
    mu_e = est.mean(0)
    mu_g = gt.mean(0)
    xe = est - mu_e
    xg = gt - mu_g
    cov = (xg.T @ xe) / est.shape[0]
    U, D, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = S.at[2, 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = U @ S @ Vt
    var_e = (xe ** 2).sum() / est.shape[0]
    s = jnp.where(with_scale, (D * jnp.diag(S)).sum() / var_e, 1.0)
    t = mu_g - s * R @ mu_e
    return s, R, t


def ate_rmse(est: jax.Array, gt: jax.Array, align: bool = True) -> jax.Array:
    """RMSE of camera-center error after (optional) similarity alignment."""
    if align:
        s, R, t = align_umeyama(est, gt)
        est = s * est @ R.T + t
    return jnp.sqrt(((est - gt) ** 2).sum(-1).mean())


def camera_centers(cams: jax.Array) -> jax.Array:
    """World->cam [N, 4, 4] -> camera centers [N, 3] (-R^T t)."""
    R = cams[:, :3, :3]
    t = cams[:, :3, 3]
    return -jnp.einsum("nij,ni->nj", R, t)
