"""On-device essential-matrix RANSAC + pose recovery.

Replaces the per-pair host loop of cv2.findEssentialMat + cv2.recoverPose in
depth validation (reference: model/loftr_src/utils/metrics.py:72-98) with a
fixed-iteration, fully jittable pipeline mirroring geometry/ransac.py's
homography machinery:

    K gumbel-top-8 minimal samples -> batched weighted 8-point solves
    (smallest eigenvector of the 9x9 normal matrix, projected onto the
    essential manifold) -> Sampson-distance scoring -> argmax -> IRLS
    re-fit on inliers -> 4-way (R, t) decomposition with a cheirality vote.

The algorithm is the normalized 8-point + RANSAC (OpenCV uses Nister's
5-point inside findEssentialMat); equivalence is established statistically —
pose-AUC parity vs the cv2 path is cross-tested in tests/test_pose.py, the
same way homography RANSAC was validated against cv2.findHomography.

Everything is fixed-shape: correspondences arrive capacity-padded with a
validity mask, points already normalized by the camera intrinsics
(x_norm = (x - c) / f, exactly as metrics.py:80-83 does before cv2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def eight_point_essential(p0: jax.Array, p1: jax.Array,
                          w: jax.Array) -> jax.Array:
    """Weighted 8-point essential matrix from normalized correspondences.

    Args:
        p0, p1: [N, 2] points in normalized camera coordinates.
        w: [N] non-negative weights (0 excludes a correspondence).
    Returns:
        [3, 3] essential matrix with singular values (1, 1, 0).
    """
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    ones = jnp.ones_like(x0)
    # Epipolar constraint rows: x1^T E x0 = 0.
    A = jnp.stack([x1 * x0, x1 * y0, x1,
                   y1 * x0, y1 * y0, y1,
                   x0, y0, ones], axis=-1)                 # [N, 9]
    sw = jnp.sqrt(jnp.maximum(w, 0.0))[:, None]
    A = A * sw
    hp = jax.lax.Precision.HIGHEST
    AtA = jnp.matmul(A.T, A, precision=hp)                 # [9, 9]
    _, vecs = jnp.linalg.eigh(AtA)
    E = vecs[:, 0].reshape(3, 3)
    # Project onto the essential manifold: singular values -> (1, 1, 0).
    U, s, Vt = jnp.linalg.svd(E)
    return (U * jnp.array([1.0, 1.0, 0.0], E.dtype)) @ Vt


def sampson_err2(E: jax.Array, p0: jax.Array, p1: jax.Array,
                 eps: float = 1e-12) -> jax.Array:
    """Squared Sampson distance of the epipolar constraint, [N].

    The same first-order geometric error OpenCV's RANSAC thresholds inside
    findEssentialMat.
    """
    h0 = jnp.concatenate([p0, jnp.ones_like(p0[:, :1])], -1)   # [N, 3]
    h1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], -1)
    Ex0 = h0 @ E.T                                             # [N, 3]
    Etx1 = h1 @ E                                              # [N, 3]
    num = jnp.sum(h1 * Ex0, -1) ** 2
    den = Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2 + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2
    return num / jnp.maximum(den, eps)


def decompose_essential(E: jax.Array):
    """The four (R, t) candidates of an essential matrix.

    Returns:
        Rs: [4, 3, 3] rotations (det +1), ts: [4, 3] unit translations.
    """
    U, _, Vt = jnp.linalg.svd(E)
    # Keep proper rotations: flip the sign of the last column/row as needed.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0],
                   [1.0, 0.0, 0.0],
                   [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _depths(R: jax.Array, t: jax.Array, p0: jax.Array, p1: jax.Array,
            eps: float = 1e-12):
    """Two-view least-squares depths (z0, z1) along the bearing rays.

    Minimizes |z0 (R x0) + t - z1 x1|^2 per correspondence — the midpoint
    triangulation used only for the cheirality (points-in-front) vote, the
    role cv2.recoverPose's internal triangulation plays.
    """
    x0 = jnp.concatenate([p0, jnp.ones_like(p0[:, :1])], -1)   # [N, 3]
    x1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], -1)
    a = x0 @ R.T                                               # [N, 3]
    aa = jnp.sum(a * a, -1)
    bb = jnp.sum(x1 * x1, -1)
    ab = jnp.sum(a * x1, -1)
    at = a @ t
    bt = x1 @ t
    det = aa * bb - ab * ab
    # [aa -ab; -ab bb] [z0; -z1] = [-at; -bt]  (solve the 2x2 normal system)
    z0 = (-at * bb + ab * bt) / jnp.maximum(det, eps)
    z1 = (aa * bt - ab * at) / jnp.maximum(det, eps)
    return z0, z1


@partial(jax.jit, static_argnames=("iters", "refine_iters"))
def ransac_essential(
    key: jax.Array,
    p0: jax.Array,
    p1: jax.Array,
    valid: jax.Array,
    thr: float = 1e-3,
    iters: int = 512,
    refine_iters: int = 2,
    min_valid: int = 5,
):
    """Robust essential-matrix fit + pose on capacity-padded correspondences.

    Args:
        key: PRNG key.
        p0, p1: [N, 2] normalized-coordinate correspondences (padded).
        valid: [N] bool.
        thr: inlier threshold on the Sampson distance, in normalized units
            (cv2 semantics: pixel_thresh / mean focal length).
        iters: number of 8-point hypotheses (static).
        refine_iters: IRLS re-fit rounds on the inlier set (static).
        min_valid: minimum correspondences for a meaningful fit.

    Returns:
        dict with 'E' [3,3], 'R' [3,3], 't' [3], 'inliers' [N] bool
        (cheirality-filtered, recoverPose mask semantics), 'num_inliers',
        'ok' bool.
    """
    n = p0.shape[0]
    validf = valid.astype(jnp.float32)
    n_valid = valid.sum()

    # --- 1. hypothesis samples: gumbel top-12 over valid entries.
    # 12-point least-squares samples instead of minimal 8-point: with
    # realistic match noise an 8-point hypothesis is so jittery that even
    # LO cannot always recover the full inlier set (sweep on noisy
    # synthetic pairs: 8pt/512 iters -> 2/18 poses >5 deg off; 12pt -> 0/18,
    # worst 3.9 deg). The cost is clean-sample probability (0.8^12 = 7% at
    # 20% outliers, still ~35 clean hypotheses at 512 iters); at extreme
    # outlier rates raise `iters` rather than shrinking the sample.
    sample_n = 12
    g = jax.random.gumbel(key, (iters, n))
    scores = jnp.where(valid[None, :], g, -jnp.inf)
    _, sample_idx = jax.lax.top_k(scores, sample_n)        # [iters, 12]
    ones_s = jnp.ones(sample_n, p0.dtype)
    Es = jax.vmap(
        lambda idx: eight_point_essential(p0[idx], p1[idx], ones_s)
    )(sample_idx)                                          # [iters, 3, 3]
    finite = jnp.isfinite(Es).all(axis=(1, 2))

    # --- 2. score by Sampson distance. Leaders are RANKED by the capture
    # count at a widened (2x) threshold: a noisy minimal hypothesis near the
    # true model captures a broad, loose inlier set, while a locally-
    # overfit wrong model scores high only at the tight threshold — the
    # widened ranking is markedly more stable under match noise.
    err2 = jax.vmap(sampson_err2, in_axes=(0, None, None))(Es, p0, p1)
    inl = (err2 < thr * thr) & valid[None, :]              # [iters, N]
    wide = (err2 < (2 * thr) ** 2) & valid[None, :]
    counts = jnp.where(finite, wide.sum(-1), -1)

    # --- 3. LO-RANSAC: widen-then-tighten IRLS on the TOP-K hypotheses.
    # A minimal 8-point hypothesis from noisy matches is itself noisy and
    # captures only a fraction of the true inliers, and the best-COUNTING
    # hypothesis can sit in a local basin (measured: 75 of ~150 available
    # inliers on noisy synthetic pairs) — so refit several leaders on a
    # widened capture (4x, then 2x the threshold), tighten, and only then
    # pick the winner.
    k_lo = min(16, iters)
    _, top = jax.lax.top_k(counts, k_lo)                   # [k_lo]
    mults = jnp.asarray([4.0, 2.0] + [1.0] * refine_iters, jnp.float32)

    def lo(E, inliers):
        E = jnp.where(jnp.isfinite(E).all(), E, jnp.eye(3, dtype=E.dtype))

        def polish(carry, mult):
            E, inliers = carry
            cap = (sampson_err2(E, p0, p1) < (mult * thr) ** 2) & valid
            w = cap.astype(jnp.float32) * validf
            E_new = eight_point_essential(p0, p1, w)
            good = jnp.isfinite(E_new).all() & (w.sum() >= 8)
            E_new = jnp.where(good, E_new, E)
            new_inl = (sampson_err2(E_new, p0, p1) < thr * thr) & valid
            keep = new_inl.sum() >= inliers.sum()
            return (jnp.where(keep, E_new, E),
                    jnp.where(keep, new_inl, inliers)), None

        (E, inliers), _ = jax.lax.scan(polish, (E, inliers), mults)
        return E, inliers

    Es_lo, inl_lo = jax.vmap(lo)(Es[top], inl[top])        # [k_lo, ...]
    best = jnp.argmax(inl_lo.sum(-1))
    E = Es_lo[best]
    inliers = inl_lo[best]

    # --- 4. pose: 4-way decomposition + cheirality vote over the inliers.
    Rs, ts = decompose_essential(E)
    z0s, z1s = jax.vmap(_depths, in_axes=(0, 0, None, None))(Rs, ts, p0, p1)
    front = (z0s > 0) & (z1s > 0) & inliers[None, :]       # [4, N]
    votes = front.sum(-1)
    pick = jnp.argmax(votes)
    R, t = Rs[pick], ts[pick]
    pose_inliers = front[pick]

    num_inliers = pose_inliers.sum()
    ok = ((n_valid >= min_valid) & (votes[pick] > 0)
          & jnp.isfinite(E).all())
    return {"E": E, "R": R, "t": t, "inliers": pose_inliers,
            "num_inliers": num_inliers, "ok": ok}


def normalize_by_intrinsics(kpts: jax.Array, K: jax.Array) -> jax.Array:
    """Pixel -> normalized camera coordinates (metrics.py:80-81 semantics)."""
    c = jnp.stack([K[0, 2], K[1, 2]])
    f = jnp.stack([K[0, 0], K[1, 1]])
    return (kpts - c[None]) / f[None]


@partial(jax.jit, static_argnames=("iters",))
def batched_pose_errors(
    key: jax.Array,
    mkpts0: jax.Array,
    mkpts1: jax.Array,
    valid: jax.Array,
    K0: jax.Array,
    K1: jax.Array,
    T_0to1: jax.Array,
    thresh: float = 0.5,
    iters: int = 512,
):
    """Fully-jitted batch of pose recoveries + angular errors.

    The device-side replacement for the per-pair host loop in
    run_depth_validation (reference flow: metrics.py:101-134 estimate_pose
    -> relative_pose_error). Failed fits return inf errors, matching the
    host path's convention.

    Args:
        mkpts0, mkpts1: [B, N, 2] padded matches in pixels.
        valid: [B, N] bool.
        K0, K1: [B, 3, 3]; T_0to1: [B, 4, 4].
        thresh: RANSAC threshold in pixels (cv2 convention; divided by the
            mean focal length per pair, metrics.py:84).
    Returns:
        (t_err_deg, R_err_deg, num_inliers, ok): each [B].
    """

    def one(key, k0, k1, v, Ka, Kb, T):
        p0 = normalize_by_intrinsics(k0, Ka)
        p1 = normalize_by_intrinsics(k1, Kb)
        fmean = (Ka[0, 0] + Ka[1, 1] + Kb[0, 0] + Kb[1, 1]) / 4.0
        res = ransac_essential(key, p0, p1, v, thr=thresh / fmean,
                               iters=iters)
        R, t = res["R"], res["t"]
        t_gt = T[:3, 3]
        R_gt = T[:3, :3]
        nrm = jnp.linalg.norm(t) * jnp.linalg.norm(t_gt)
        t_err = jnp.rad2deg(jnp.arccos(jnp.clip(
            jnp.dot(t, t_gt) / jnp.maximum(nrm, 1e-12), -1.0, 1.0)))
        t_err = jnp.minimum(t_err, 180.0 - t_err)
        cos = jnp.clip((jnp.trace(R.T @ R_gt) - 1.0) / 2.0, -1.0, 1.0)
        R_err = jnp.rad2deg(jnp.abs(jnp.arccos(cos)))
        inf = jnp.asarray(jnp.inf, t_err.dtype)
        return (jnp.where(res["ok"], t_err, inf),
                jnp.where(res["ok"], R_err, inf),
                res["num_inliers"], res["ok"])

    keys = jax.random.split(key, mkpts0.shape[0])
    return jax.vmap(one)(keys, mkpts0, mkpts1, valid, K0, K1, T_0to1)
