"""Structure-from-motion glue: triangulation, track chaining, BA problem
construction from matcher output.

Closes the engine loop of the BASELINE north star: correspondences from the
GeoFormer matcher become multi-view tracks, triangulated landmarks, and a
capacity-padded BAProblem for the Schur solver (engine/ba.py).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from geoformer_tpu.engine.ba import BAProblem


def triangulate(T0: jax.Array, T1: jax.Array, K: jax.Array,
                uv0: jax.Array, uv1: jax.Array) -> jax.Array:
    """Linear (DLT) two-view triangulation.

    Args:
        T0, T1: [4, 4] world->cam poses.
        K: [3, 3] shared intrinsics.
        uv0, uv1: [N, 2] pixel observations.
    Returns:
        [N, 3] world points.
    """
    P0 = K @ T0[:3, :]                                  # [3, 4]
    P1 = K @ T1[:3, :]

    def solve_one(a0, a1):
        A = jnp.stack([
            a0[0] * P0[2] - P0[0],
            a0[1] * P0[2] - P0[1],
            a1[0] * P1[2] - P1[0],
            a1[1] * P1[2] - P1[1],
        ])                                              # [4, 4]
        hp = jax.lax.Precision.HIGHEST
        _, v = jnp.linalg.eigh(jnp.matmul(A.T, A, precision=hp))
        X = v[:, 0]
        return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])

    return jax.vmap(solve_one)(uv0, uv1)


def chain_tracks(pair_matches: Sequence[Tuple[np.ndarray, np.ndarray]],
                 cell: float = 8.0) -> List[List[Tuple[int, np.ndarray]]]:
    """Link per-pair matches into multi-frame tracks (host-side).

    Args:
        pair_matches: list over frames i of (kpts_i [N,2], kpts_{i+1} [N,2]).
        cell: quantization for linking frame i's match endpoints to frame i's
            query grid of the next pair (the matcher anchors queries on the
            coarse grid, so endpoints land near grid centers).
    Returns:
        tracks: list of [(frame_idx, uv), ...] with length >= 2.
    """
    open_tracks: Dict[Tuple[int, int], list] = {}
    done: List[list] = []
    for fi, (k0, k1) in enumerate(pair_matches):
        next_open: Dict[Tuple[int, int], list] = {}
        for a, b in zip(np.asarray(k0), np.asarray(k1)):
            keya = (int(round(a[0] / cell)), int(round(a[1] / cell)))
            tr = open_tracks.pop(keya, None)
            if tr is None:
                tr = [(fi, a)]
            tr.append((fi + 1, b))
            keyb = (int(round(b[0] / cell)), int(round(b[1] / cell)))
            next_open[keyb] = tr
        done.extend(tr for tr in open_tracks.values())
        open_tracks = next_open
    done.extend(open_tracks.values())
    return [t for t in done if len(t) >= 2]


def build_ba_problem(
    cams: np.ndarray,
    K: np.ndarray,
    tracks: List[List[Tuple[int, np.ndarray]]],
    max_points: int,
    max_obs: int,
) -> BAProblem:
    """Triangulate tracks (first/last observation) and pack a fixed-capacity
    BAProblem."""
    tracks = tracks[:max_points]
    P = max_points
    pts = np.zeros((P, 3), np.float32)
    obs_cam = np.zeros(max_obs, np.int32)
    obs_pt = np.zeros(max_obs, np.int32)
    obs_uv = np.zeros((max_obs, 2), np.float32)
    obs_valid = np.zeros(max_obs, bool)

    # triangulate in one batch from each track's first/last view
    f0 = np.array([t[0][0] for t in tracks], np.int32)
    f1 = np.array([t[-1][0] for t in tracks], np.int32)
    uv0 = np.stack([t[0][1] for t in tracks]).astype(np.float32)
    uv1 = np.stack([t[-1][1] for t in tracks]).astype(np.float32)
    X = np.asarray(jax.vmap(
        lambda a, b, u, v: triangulate(a, b, jnp.asarray(K), u[None],
                                       v[None])[0]
    )(jnp.asarray(cams)[f0], jnp.asarray(cams)[f1], jnp.asarray(uv0),
      jnp.asarray(uv1)))
    pts[:len(tracks)] = X

    n = 0
    for pi, tr in enumerate(tracks):
        for (fi, uv) in tr:
            if n >= max_obs:
                break
            obs_cam[n] = fi
            obs_pt[n] = pi
            obs_uv[n] = uv
            obs_valid[n] = True
            n += 1
    return BAProblem(
        cams=jnp.asarray(cams), points=jnp.asarray(pts), K=jnp.asarray(K),
        obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv), obs_valid=jnp.asarray(obs_valid))
