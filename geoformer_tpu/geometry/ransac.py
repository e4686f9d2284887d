"""On-device batched RANSAC + DLT homography estimation.

Replaces every cv2.findHomography call in the reference — the mid-forward GAM
RANSAC (reference: model/geo_module.py:48, thr 8.0) and the eval-time solver
(reference: eval_tool/immatch/utils/hpatches_helper.py:216-218, thr 3/15) —
with a fixed-iteration, fully jittable pipeline:

    K gumbel-top-k 4-point minimal samples  ->  batched 8x8 exact solves
    ->  forward reprojection scoring  ->  argmax  ->  IRLS-weighted DLT polish.

Everything is fixed-shape: points arrive capacity-padded with a validity mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from geoformer_tpu.geometry.homography import four_point_homography, warp_points


def _normalization(pts: jax.Array, w: jax.Array):
    """Hartley normalization transform for conditioning the DLT system."""
    wsum = jnp.maximum(w.sum(), 1e-8)
    mean = (pts * w[:, None]).sum(0) / wsum
    d = jnp.sqrt(((pts - mean) ** 2).sum(-1) + 1e-12)
    scale = jnp.sqrt(2.0) / jnp.maximum((d * w).sum() / wsum, 1e-8)
    T = jnp.array(
        [[scale, 0.0, -scale * mean[0]],
         [0.0, scale, -scale * mean[1]],
         [0.0, 0.0, 1.0]], pts.dtype)
    return T


def dlt_homography(pts0: jax.Array, pts1: jax.Array, weights: jax.Array) -> jax.Array:
    """Weighted normalized DLT: least-squares H with pts1 ~ H @ pts0.

    Args:
        pts0, pts1: [N, 2].
        weights: [N] non-negative (0 excludes a correspondence).
    Returns:
        [3, 3] homography (h22-normalized when well-posed).
    """
    T0 = _normalization(pts0, weights)
    T1 = _normalization(pts1, weights)
    p0 = warp_points(pts0, T0)
    p1 = warp_points(pts1, T1)

    x, y = p0[:, 0], p0[:, 1]
    u, v = p1[:, 0], p1[:, 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    # Rows of the 2N x 9 DLT system.
    ax = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y, -u], -1)
    ay = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y, -v], -1)
    sw = jnp.sqrt(jnp.maximum(weights, 0.0))
    A = jnp.concatenate([ax * sw[:, None], ay * sw[:, None]], axis=0)
    # Null vector of A via smallest eigenvector of A^T A (9x9 — cheap, stable).
    # Full f32 precision: coordinate geometry cannot tolerate bf16 MXU passes.
    hp = jax.lax.Precision.HIGHEST
    AtA = jnp.matmul(A.T, A, precision=hp)
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[:, 0]
    Hn = h.reshape(3, 3)
    H = jnp.matmul(jnp.matmul(jnp.linalg.inv(T1), Hn, precision=hp), T0,
                   precision=hp)
    denom = jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1.0, H[2, 2])
    return H / denom


def _reproj_err2(H: jax.Array, pts0: jax.Array, pts1: jax.Array) -> jax.Array:
    """Squared forward reprojection error |H p0 - p1|^2, [N]."""
    w = warp_points(pts0, H)
    return ((w - pts1) ** 2).sum(-1)


@partial(jax.jit, static_argnames=("iters", "refine_iters"))
def ransac_homography(
    key: jax.Array,
    pts0: jax.Array,
    pts1: jax.Array,
    valid: jax.Array,
    thr: float = 3.0,
    iters: int = 512,
    refine_iters: int = 2,
    min_valid: int = 4,
):
    """Robust homography fit on capacity-padded correspondences.

    Args:
        key: PRNG key.
        pts0, pts1: [N, 2] padded correspondence sets.
        valid: [N] bool.
        thr: inlier threshold in pixels (cv2-compatible semantics).
        iters: number of 4-point hypotheses (static).
        refine_iters: IRLS polish rounds on the inlier set (static).
        min_valid: minimum valid correspondences for a meaningful fit.

    Returns:
        dict with 'H' [3,3], 'inliers' [N] bool, 'num_inliers' int32,
        'ok' bool (fit attempted and produced a finite H with >=4 inliers).
    """
    n = pts0.shape[0]
    validf = valid.astype(jnp.float32)
    n_valid = valid.sum()

    # --- 1. minimal samples: gumbel top-4 over valid entries per hypothesis.
    g = jax.random.gumbel(key, (iters, n))
    scores = jnp.where(valid[None, :], g, -jnp.inf)
    _, sample_idx = jax.lax.top_k(scores, 4)               # [iters, 4]
    s0 = pts0[sample_idx]                                  # [iters, 4, 2]
    s1 = pts1[sample_idx]

    # --- 2. batched exact 4-point solves (vmapped 8x8 linear systems).
    Hs = jax.vmap(four_point_homography)(s0, s1)           # [iters, 3, 3]
    finite = jnp.isfinite(Hs).all(axis=(1, 2))

    # --- 3. score by MSAC (truncated quadratic) forward reprojection.
    # Plain inlier COUNT cannot discriminate hypotheses at loose thresholds
    # (thr 8/15: a several-px-wrong model still captures every true inlier,
    # so count saturates and argmax picks arbitrarily among near-ties —
    # measured 4 px median corner error at thr=15, scripts/ransac_ab.py).
    # The truncated quadratic stays count-like for outliers but ranks
    # near-tied models by inlier residual mass, like cv2's MAGSAC scoring.
    err2 = jax.vmap(_reproj_err2, in_axes=(0, None, None))(Hs, pts0, pts1)
    t2 = jnp.float32(thr * thr)
    inl = (err2 < t2) & valid[None, :]                     # [iters, N]
    cost = jnp.where(finite,
                     (jnp.minimum(err2, t2) * validf[None, :]).sum(-1),
                     jnp.inf)

    best = jnp.argmin(cost)
    H = Hs[best]
    H = jnp.where(jnp.isfinite(H).all(), H, jnp.eye(3, dtype=H.dtype))
    inliers = inl[best]

    # --- 4. annealed IRLS polish: weighted DLT on a wide->narrow inlier
    # band (LO-RANSAC threshold annealing). When the noise scale nears thr,
    # the minimal-sample model's thr-band captures a BIASED inlier subset
    # (points whose noise leans toward the wrong model) — refitting at a
    # wide band first recovers the unbiased inlier mass, then the band
    # contracts to thr. Acceptance is by MSAC cost at the base threshold
    # (NOT count: a refit that trades a lucky-outlier count tie for lower
    # inlier residuals must win). Measured (scripts/ransac_ab.py): median
    # corner error 6.2 -> 2.0 px at inlier_ratio 0.3 / noise 3 / thr 3.
    def _msac(Hc):
        return (jnp.minimum(_reproj_err2(Hc, pts0, pts1), t2) * validf).sum()

    def polish(i, carry):
        H, inliers = carry
        # band multiplier 2^(refine_iters-1-i), clamped to 4: e.g. [4,2,1]
        m = jnp.minimum(2.0 ** (refine_iters - 1 - i), 4.0)
        band = (_reproj_err2(H, pts0, pts1) < t2 * m * m) & valid
        w = band.astype(jnp.float32) * validf
        H_new = dlt_homography(pts0, pts1, w)
        good = jnp.isfinite(H_new).all() & (w.sum() >= 4)
        H_new = jnp.where(good, H_new, H)
        e2 = _reproj_err2(H_new, pts0, pts1)
        new_inl = (e2 < t2) & valid
        keep = _msac(H_new) <= _msac(H)
        H_out = jnp.where(keep, H_new, H)
        inl_out = jnp.where(keep, new_inl, inliers)
        return H_out, inl_out

    H, inliers = jax.lax.fori_loop(0, refine_iters, polish, (H, inliers))

    num_inliers = inliers.sum()
    ok = (n_valid >= min_valid) & (num_inliers >= 4) & jnp.isfinite(H).all()
    return {"H": H, "inliers": inliers, "num_inliers": num_inliers, "ok": ok}
