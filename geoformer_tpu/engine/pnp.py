"""Perspective-n-Point: camera pose from 2D-3D correspondences (pure JAX).

Completes the native visual-localization path (match -> tracks ->
triangulation/BA -> localize a query): DLT resectioning on normalized
coordinates with orthogonality cleanup, wrapped in fixed-iteration RANSAC
and a Gauss-Newton refinement on se(3) — the role cv2.solvePnPRansac /
COLMAP registration plays in the reference's localization pipeline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from geoformer_tpu.engine.lie import se3_exp


def _dlt_pose(pts3d: jax.Array, uv_norm: jax.Array, w: jax.Array):
    """Weighted DLT for the 3x4 projection [R|t] from normalized image
    coordinates; returns a rigid pose via SVD orthogonalization."""
    hp = jax.lax.Precision.HIGHEST
    X, Y, Z = pts3d[:, 0], pts3d[:, 1], pts3d[:, 2]
    u, v = uv_norm[:, 0], uv_norm[:, 1]
    zeros = jnp.zeros_like(X)
    ones = jnp.ones_like(X)
    r1 = jnp.stack([X, Y, Z, ones, zeros, zeros, zeros, zeros,
                    -u * X, -u * Y, -u * Z, -u], -1)
    r2 = jnp.stack([zeros, zeros, zeros, zeros, X, Y, Z, ones,
                    -v * X, -v * Y, -v * Z, -v], -1)
    sw = jnp.sqrt(jnp.maximum(w, 0.0))[:, None]
    A = jnp.concatenate([r1 * sw, r2 * sw], axis=0)          # [2N, 12]
    _, vecs = jnp.linalg.eigh(jnp.matmul(A.T, A, precision=hp))
    P = vecs[:, 0].reshape(3, 4)
    # fix sign: points must be in front (positive depth on average)
    depths = P[2, :3] @ pts3d.T + P[2, 3]
    P = P * jnp.where((depths * w).sum() < 0, -1.0, 1.0)
    # closest rotation to the left 3x3
    M = P[:, :3]
    U, S, Vt = jnp.linalg.svd(M)
    R = U @ Vt
    R = R * jnp.sign(jnp.linalg.det(R))
    scale = S.mean() * jnp.sign(jnp.linalg.det(U @ Vt))
    t = P[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    T = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
    return T


def _homography_pose(pts3d: jax.Array, uv_norm: jax.Array, w: jax.Array):
    """Pose from near-coplanar 2D-3D matches via plane-homography
    decomposition (the IPPE/planar-PnP case cv2.solvePnP handles with
    SOLVEPNP_IPPE). The 6-point DLT is rank-deficient when the sampled 3D
    points are coplanar — the dominant configuration in man-made scenes
    (building facades, walls) — so RANSAC scores hypotheses from BOTH
    solvers and keeps whichever fits.

    Fits a plane to the weighted points, maps plane coordinates to
    normalized image coordinates with a weighted homography DLT, and reads
    the pose off H = s * [R e1, R e2, R mu + t].
    """
    hp = jax.lax.Precision.HIGHEST
    wsum = w.sum() + 1e-9
    mu = (pts3d * w[:, None]).sum(0) / wsum
    d = pts3d - mu
    C = jnp.matmul((d * w[:, None]).T, d, precision=hp)
    _, evecs = jnp.linalg.eigh(C)                    # ascending eigenvalues
    e1, e2 = evecs[:, 2], evecs[:, 1]                # in-plane basis
    st = jnp.stack([d @ e1, d @ e2], -1)             # [N, 2] plane coords
    x, y = st[:, 0], st[:, 1]
    u, v = uv_norm[:, 0], uv_norm[:, 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    r1 = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y, -u], -1)
    r2 = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y, -v], -1)
    sw = jnp.sqrt(jnp.maximum(w, 0.0))[:, None]
    A = jnp.concatenate([r1 * sw, r2 * sw], axis=0)  # [2N, 9]
    _, vecs = jnp.linalg.eigh(jnp.matmul(A.T, A, precision=hp))
    H = vecs[:, 0].reshape(3, 3)
    # sign: the plane centroid (st = 0) must have positive depth
    H = H * jnp.where(H[2, 2] < 0, -1.0, 1.0)
    B = H[:, :2]                                     # s * [R e1, R e2]
    U, S, Vt = jnp.linalg.svd(B, full_matrices=False)
    R12 = jnp.matmul(U, Vt, precision=hp)            # closest orthonormal
    scale = S.mean()
    r3 = jnp.cross(R12[:, 0], R12[:, 1])
    R_cp = jnp.stack([R12[:, 0], R12[:, 1], r3], axis=1)  # plane -> cam
    t_cam = H[:, 2] / jnp.where(scale < 1e-12, 1e-12, scale)
    E = jnp.stack([e1, e2, jnp.cross(e1, e2)], axis=1)    # plane -> world
    R_w2c = jnp.matmul(R_cp, E.T, precision=hp)
    t_w2c = t_cam - R_w2c @ mu
    return jnp.eye(4).at[:3, :3].set(R_w2c).at[:3, 3].set(t_w2c)


def _reproj_norm(T, pts3d, uv_norm):
    pc = pts3d @ T[:3, :3].T + T[:3, 3]
    z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
    proj = pc[:, :2] / z[:, None]
    return jnp.linalg.norm(proj - uv_norm, axis=-1)


@partial(jax.jit, static_argnames=("iters", "refine_iters"))
def pnp_ransac(
    key: jax.Array,
    pts3d: jax.Array,
    uv: jax.Array,
    K: jax.Array,
    valid: jax.Array,
    thr_px: float = 4.0,
    iters: int = 256,
    refine_iters: int = 5,
    min_valid: int = 6,
):
    """Robust pose (world->cam) from capacity-padded 2D-3D matches.

    Returns dict with 'T' [4, 4], 'inliers' [N], 'num_inliers', 'ok'.
    """
    n = pts3d.shape[0]
    f = (K[0, 0] + K[1, 1]) / 2
    uv_norm = (uv - K[:2, 2][None]) / jnp.array([K[0, 0], K[1, 1]])[None]
    thr = thr_px / f

    # minimal 6-point samples via gumbel top-k over valid entries
    g = jax.random.gumbel(key, (iters, n))
    scores = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(scores, 6)

    def fit_min(sample_idx):
        w = jnp.zeros(n).at[sample_idx].set(1.0) * valid
        # general (DLT) + planar (homography) hypotheses per sample: the
        # DLT is degenerate for coplanar samples, the homography for
        # strongly non-coplanar ones; scoring keeps whichever fits.
        return jnp.stack([_dlt_pose(pts3d, uv_norm, w),
                          _homography_pose(pts3d, uv_norm, w)])

    Ts = jax.vmap(fit_min)(idx).reshape(-1, 4, 4)            # [2*iters,4,4]
    errs = jax.vmap(_reproj_norm, in_axes=(0, None, None))(Ts, pts3d, uv_norm)
    inl = (errs < thr) & valid[None, :]
    finite = jnp.isfinite(Ts).all(axis=(1, 2))
    counts = jnp.where(finite, inl.sum(-1), -1)
    best = jnp.argmax(counts)
    T = jnp.where(jnp.isfinite(Ts[best]).all(), Ts[best], jnp.eye(4))
    inliers = inl[best]

    # refit on inliers (both solvers), then Gauss-Newton polish on se(3)
    w = inliers.astype(jnp.float32) * valid

    def _score(Tc):
        good = jnp.isfinite(Tc).all() & (w.sum() >= 6)
        cnt = ((_reproj_norm(Tc, pts3d, uv_norm) < thr) & valid).sum()
        return jnp.where(good, cnt, -1)

    T_dlt = _dlt_pose(pts3d, uv_norm, w)
    T_h = _homography_pose(pts3d, uv_norm, w)
    # Refits first: argmax keeps the FIRST max on ties, so an all-inlier
    # refit that matches the minimal-sample pose's count is preferred over
    # the unrefit 6-point pose.
    cands = jnp.stack([T_dlt, T_h, T])
    scores = jnp.stack([_score(T_dlt), _score(T_h), inliers.sum()])
    T = cands[jnp.argmax(scores)]
    T = jnp.where(jnp.isfinite(T).all(), T, jnp.eye(4))

    def gn(_, T):
        def resid(xi):
            Tn = se3_exp(xi) @ T
            r = _reproj_norm(Tn, pts3d, uv_norm)
            return r * w

        r = resid(jnp.zeros(6))
        J = jax.jacfwd(resid)(jnp.zeros(6))                  # [N, 6]
        hp = jax.lax.Precision.HIGHEST
        H = jnp.matmul(J.T, J, precision=hp) + 1e-8 * jnp.eye(6)
        dx = jnp.linalg.solve(H, -(J.T @ r))
        T_new = se3_exp(dx) @ T
        better = (resid(jnp.zeros(6)) ** 2).sum() > \
            (_reproj_norm(T_new, pts3d, uv_norm) * w) @ \
            (_reproj_norm(T_new, pts3d, uv_norm) * w)
        return jnp.where(better, T_new, T)

    with jax.default_matmul_precision("highest"):
        T = jax.lax.fori_loop(0, refine_iters, gn, T)

    final_err = _reproj_norm(T, pts3d, uv_norm)
    inliers = (final_err < thr) & valid
    ok = (valid.sum() >= min_valid) & (inliers.sum() >= 6) & \
        jnp.isfinite(T).all()
    return {"T": T, "inliers": inliers, "num_inliers": inliers.sum(),
            "ok": ok}
