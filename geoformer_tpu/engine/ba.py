"""Bundle adjustment: Levenberg-damped Gauss-Newton with Schur complement.

The engine-layer capability the reference lacks (BASELINE.json north star):
correspondences from the matcher feed a native, jit-compiled BA solver.
Design is TPU-first:

  * per-observation projection Jacobians via vmapped forward-mode autodiff,
  * block accumulation (U per camera, V per point, W per observation) with
    segment_sum — no sparse matrices,
  * Schur complement: point blocks (3x3) are batch-inverted, the reduced
    camera system S [6C, 6C] is assembled with dense einsums (MXU-friendly),
  * fixed shapes: observations arrive capacity-padded with a validity mask,
  * distribution: observations/points shard over the mesh data axis; the
    reduced system is psum'd (see ba_solve_sharded) — the Schur-reduction-
    over-collectives design from SURVEY.md §7.2 step 9.

Cameras are world->camera SE(3), parameterized by local se(3) updates
(left-multiplied). Camera 0 is gauge-fixed.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from geoformer_tpu.engine.lie import se3_apply, se3_exp


class BAProblem(NamedTuple):
    cams: jax.Array     # [C, 4, 4] world->cam
    points: jax.Array   # [P, 3]
    K: jax.Array        # [3, 3] shared intrinsics
    obs_cam: jax.Array  # [N] int32
    obs_pt: jax.Array   # [N] int32
    obs_uv: jax.Array   # [N, 2]
    obs_valid: jax.Array  # [N] bool


def _project(cam_T, pt, K):
    """World point -> pixel. cam_T [4,4], pt [3], K [3,3] -> [2]."""
    pc = cam_T[:3, :3] @ pt + cam_T[:3, 3]
    z = jnp.maximum(pc[2], 1e-6)
    uv = K @ (pc / z)
    return uv[:2]


def _residual(xi_c, dp, cam_T, pt, uv, K):
    """Residual at local update (xi_c for the camera, dp for the point)."""
    T = se3_exp(xi_c) @ cam_T
    return _project(T, pt + dp, K) - uv


def reprojection_errors(prob: BAProblem) -> jax.Array:
    """[N] pixel errors (padding slots -> 0)."""
    cams = prob.cams[prob.obs_cam]
    pts = prob.points[prob.obs_pt]
    uv = jax.vmap(_project, in_axes=(0, 0, None))(cams, pts, prob.K)
    err = jnp.linalg.norm(uv - prob.obs_uv, axis=-1)
    return jnp.where(prob.obs_valid, err, 0.0)


def _build_normal_blocks(prob: BAProblem, huber_delta: float = 0.0):
    """Per-observation Jacobians and residuals.

    ``huber_delta`` > 0 applies Huber IRLS row scaling: rows are multiplied
    by sqrt(w), w = 1 inside the delta, delta/|r| beyond — so the normal
    equations minimize the Huber cost at the current linearization (robust
    BA; outlier observations stop dominating the quadratic model).
    """
    cams = prob.cams[prob.obs_cam]
    pts = prob.points[prob.obs_pt]

    def per_obs(cam_T, pt, uv):
        r = _residual(jnp.zeros(6), jnp.zeros(3), cam_T, pt, uv, prob.K)
        Jc = jax.jacfwd(_residual, argnums=0)(
            jnp.zeros(6), jnp.zeros(3), cam_T, pt, uv, prob.K)   # [2, 6]
        Jp = jax.jacfwd(_residual, argnums=1)(
            jnp.zeros(6), jnp.zeros(3), cam_T, pt, uv, prob.K)   # [2, 3]
        return r, Jc, Jp

    r, Jc, Jp = jax.vmap(per_obs)(cams, pts, prob.obs_uv)
    w = prob.obs_valid.astype(r.dtype)
    if huber_delta > 0:
        err = jnp.linalg.norm(r, axis=-1)
        w = w * jnp.sqrt(jnp.where(err <= huber_delta, 1.0,
                                   huber_delta / jnp.maximum(err, 1e-8)))
    w = w[:, None]
    return r * w, Jc * w[..., None], Jp * w[..., None]


def _normal_system(p: BAProblem, C: int, P: int, reduce_fn=None,
                   huber_delta: float = 0.0):
    """Accumulate the normal-equation blocks from (possibly sharded)
    observations. ``reduce_fn`` sums partial blocks across devices (psum)."""
    hp = jax.lax.Precision.HIGHEST
    r, Jc, Jp = _build_normal_blocks(p, huber_delta)
    U = jax.ops.segment_sum(
        jnp.einsum("nri,nrj->nij", Jc, Jc, precision=hp),
        p.obs_cam, C)                                       # [C, 6, 6]
    V = jax.ops.segment_sum(
        jnp.einsum("nri,nrj->nij", Jp, Jp, precision=hp),
        p.obs_pt, P)                                        # [P, 3, 3]
    bc = -jax.ops.segment_sum(
        jnp.einsum("nri,nr->ni", Jc, r, precision=hp), p.obs_cam, C)
    bp = -jax.ops.segment_sum(
        jnp.einsum("nri,nr->ni", Jp, r, precision=hp), p.obs_pt, P)
    Wn = jnp.einsum("nri,nrj->nij", Jc, Jp, precision=hp)   # [N, 6, 3]
    cp = p.obs_cam * P + p.obs_pt
    Wfull = jax.ops.segment_sum(Wn, cp, C * P).reshape(C, P, 6, 3)
    err2 = (r ** 2).sum()
    nv = p.obs_valid.sum()
    if reduce_fn is not None:
        U, V, bc, bp, Wfull, err2, nv = jax.tree.map(
            reduce_fn, (U, V, bc, bp, Wfull, err2, nv))
    return U, V, bc, bp, Wfull, err2, nv


@partial(jax.jit, static_argnames=("iters", "n_cams", "n_points",
                                   "huber_delta"))
def ba_solve(prob: BAProblem, iters: int = 10, damping: float = 1e-3,
             n_cams: int = 0, n_points: int = 0, huber_delta: float = 0.0):
    """Run LM-damped Gauss-Newton BA. Returns (cams, points, rmse_history).

    n_cams/n_points default to the array sizes (static). huber_delta > 0
    turns on Huber IRLS row weighting (robust to outlier observations).
    """
    return _ba_solve_impl(prob, iters, damping,
                          n_cams or prob.cams.shape[0],
                          n_points or prob.points.shape[0], None,
                          huber_delta)


def _ba_solve_impl(prob: BAProblem, iters: int, damping: float, C: int,
                   P: int, reduce_fn, huber_delta: float = 0.0):
    hp = jax.lax.Precision.HIGHEST

    def gn_step(state, _):
        cams, points = state
        p = prob._replace(cams=cams, points=points)
        U, V, bc, bp, Wfull, _, _ = _normal_system(p, C, P, reduce_fn,
                                                   huber_delta)

        lamV = V + damping * jnp.eye(3)[None]
        Vinv = jnp.linalg.inv(lamV)                         # [P, 3, 3]

        # Schur complement of the point blocks.
        WVinv = jnp.einsum("cpij,pjk->cpik", Wfull, Vinv, precision=hp)
        S = jnp.einsum("cpik,dplk->cidl", WVinv, Wfull,
                       precision=hp)                        # [C, 6, C, 6]
        S = (U + damping * jnp.eye(6)[None]) \
            .reshape(C, 6, 1, 6) * jnp.eye(C)[:, None, :, None] - S
        rhs = bc - jnp.einsum("cpik,pk->ci", WVinv, bp, precision=hp)

        # Gauge fix: freeze camera 0 by pinning its block to identity.
        Sm = S.reshape(C * 6, C * 6)
        mask = jnp.arange(C * 6) >= 6
        Sm = jnp.where(mask[:, None] & mask[None, :], Sm, 0.0)
        Sm = Sm + jnp.diag(jnp.where(mask, 0.0, 1.0))
        rhs_m = jnp.where(mask, rhs.reshape(-1), 0.0)

        dx_c = jnp.linalg.solve(Sm, rhs_m).reshape(C, 6)
        dx_p = jnp.einsum(
            "pij,pj->pi", Vinv,
            bp - jnp.einsum("cpij,ci->pj", Wfull, dx_c, precision=hp))

        new_cams = jax.vmap(lambda xi, T: se3_exp(xi) @ T)(dx_c, cams)
        new_points = points + dx_p

        # accept only if error decreases (simple LM guard); under Huber the
        # guard compares the robust cost, not the quadratic one
        def global_rmse(pp):
            err = reprojection_errors(pp)
            if huber_delta > 0:
                e2 = jnp.where(
                    err <= huber_delta, err ** 2,
                    huber_delta * (2 * err - huber_delta)).sum()
            else:
                e2 = (err ** 2).sum()
            nv = pp.obs_valid.sum()
            if reduce_fn is not None:
                e2, nv = reduce_fn(e2), reduce_fn(nv)
            return jnp.sqrt(e2 / jnp.maximum(nv, 1))

        rmse_old = global_rmse(p)
        rmse_new = global_rmse(p._replace(cams=new_cams, points=new_points))
        accept = rmse_new < rmse_old
        cams = jnp.where(accept, new_cams, cams)
        points = jnp.where(accept, new_points, points)
        return (cams, points), jnp.minimum(rmse_new, rmse_old)

    with jax.default_matmul_precision("highest"):
        (cams, points), hist = jax.lax.scan(
            gn_step, (prob.cams, prob.points), None, length=iters)
    return cams, points, hist


@partial(jax.jit, static_argnames=("iters", "cg_iters", "huber_delta"))
def ba_solve_cg(prob: BAProblem, iters: int = 10, damping: float = 1e-3,
                cg_iters: int = 32, huber_delta: float = 0.0):
    """Gauss-Newton BA with a MATRIX-FREE conjugate-gradient Schur solve.

    The dense path assembles S = (U+lam) - W V^-1 W^T as a [6C, 6C] matrix
    via an O(C^2 P) einsum — fine for tens of cameras, prohibitive beyond.
    Here CG applies S to a vector in O(N) per iteration via per-observation
    W blocks and segment sums (no [C, P, 6, 3] W tensor either):

        t_p = sum_{n: pt(n)=p} Wn^T x_cam(n) ;  s_p = V_p^-1 t_p ;
        (S x)_c = (U_c + lam) x_c - sum_{n: cam(n)=c} Wn s_pt(n)

    with the gauge fix (camera 0 frozen) folded into the operator. Scales
    to hundreds of cameras / large point sets without a [6C, 6C] anywhere.

    CG is block-Jacobi preconditioned: the exact [6, 6] diagonal blocks of
    S (S_cc = U_c + lam - sum_{n: cam=c} Wn Vinv_{pt(n)} Wn^T) are cheap to
    assemble with one extra segment sum, and the Schur complement's
    conditioning is dominated by per-camera observation-count imbalance,
    which the block diagonal captures — typically halving the CG iterations
    needed for a given residual.
    """
    C = prob.cams.shape[0]
    P = prob.points.shape[0]
    hp = jax.lax.Precision.HIGHEST

    def gn_step(state, _):
        cams, points = state
        p = prob._replace(cams=cams, points=points)
        r, Jc, Jp = _build_normal_blocks(p, huber_delta)
        U = jax.ops.segment_sum(
            jnp.einsum("nri,nrj->nij", Jc, Jc, precision=hp), p.obs_cam, C)
        V = jax.ops.segment_sum(
            jnp.einsum("nri,nrj->nij", Jp, Jp, precision=hp), p.obs_pt, P)
        bc = -jax.ops.segment_sum(
            jnp.einsum("nri,nr->ni", Jc, r, precision=hp), p.obs_cam, C)
        bp = -jax.ops.segment_sum(
            jnp.einsum("nri,nr->ni", Jp, r, precision=hp), p.obs_pt, P)
        Wn = jnp.einsum("nri,nrj->nij", Jc, Jp, precision=hp)  # [N, 6, 3]

        Vinv = jnp.linalg.inv(V + damping * jnp.eye(3)[None])
        Ul = U + damping * jnp.eye(6)[None]
        gauge = (jnp.arange(C) >= 1).astype(cams.dtype)[:, None]   # [C, 1]

        def WT_x(x):      # [C, 6] -> [P, 3]: t_p = sum_{n: pt=p} Wn^T x_cam
            per = jnp.einsum("nij,ni->nj", Wn, x[p.obs_cam], precision=hp)
            return jax.ops.segment_sum(per, p.obs_pt, P)

        def W_s(s):       # [P, 3] -> [C, 6]: sum_{n: cam=c} Wn s_pt
            per = jnp.einsum("nij,nj->ni", Wn, s[p.obs_pt], precision=hp)
            return jax.ops.segment_sum(per, p.obs_cam, C)

        def S_apply(x):                                    # x: [C, 6]
            x = x * gauge
            s = jnp.einsum("pij,pj->pi", Vinv, WT_x(x), precision=hp)
            y = jnp.einsum("cij,cj->ci", Ul, x, precision=hp) - W_s(s)
            return y * gauge + x * (1 - gauge)             # frozen cam: I

        rhs = (bc - W_s(jnp.einsum("pij,pj->pi", Vinv, bp,
                                   precision=hp))) * gauge

        # Block-Jacobi preconditioner: exact 6x6 diagonal blocks of S.
        WVW = jnp.einsum("nij,njk,nlk->nil", Wn, Vinv[p.obs_pt], Wn,
                         precision=hp)                       # Wn Vinv Wn^T
        Sdiag = Ul - jax.ops.segment_sum(WVW, p.obs_cam, C)
        g3 = gauge[:, :, None]                               # [C, 1, 1]
        Minv = g3 * jnp.linalg.inv(Sdiag) + \
            (1 - g3) * jnp.eye(6)[None]                      # frozen cam: I

        def apply_Minv(r):
            return jnp.einsum("cij,cj->ci", Minv, r, precision=hp)

        def cg_body(_, st):
            x, r, d, rz = st
            Sd = S_apply(d)
            alpha = rz / jnp.maximum((d * Sd).sum(), 1e-20)
            x = x + alpha * d
            r = r - alpha * Sd
            z = apply_Minv(r)
            rz_new = (r * z).sum()
            d = z + (rz_new / jnp.maximum(rz, 1e-20)) * d
            return x, r, d, rz_new

        x0 = jnp.zeros_like(rhs)
        z0 = apply_Minv(rhs)
        st = (x0, rhs, z0, (rhs * z0).sum())
        dx_c, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, st)
        dx_c = dx_c * gauge

        dx_p = jnp.einsum("pij,pj->pi", Vinv, bp - WT_x(dx_c),
                          precision=hp)
        new_cams = jax.vmap(lambda xi, T: se3_exp(xi) @ T)(dx_c, cams)
        new_points = points + dx_p

        def cost(pp):
            err = reprojection_errors(pp)
            if huber_delta > 0:
                e2 = jnp.where(err <= huber_delta, err ** 2,
                               huber_delta * (2 * err - huber_delta)).sum()
            else:
                e2 = (err ** 2).sum()
            return jnp.sqrt(e2 / jnp.maximum(pp.obs_valid.sum(), 1))

        rmse_old = cost(p)
        rmse_new = cost(p._replace(cams=new_cams, points=new_points))
        accept = rmse_new < rmse_old
        cams = jnp.where(accept, new_cams, cams)
        points = jnp.where(accept, new_points, points)
        return (cams, points), jnp.minimum(rmse_new, rmse_old)

    with jax.default_matmul_precision("highest"):
        (cams, points), hist = jax.lax.scan(
            gn_step, (prob.cams, prob.points), None, length=iters)
    return cams, points, hist


def ba_solve_sharded(prob: BAProblem, mesh, iters: int = 10,
                     damping: float = 1e-3, axis: str = "data"):
    """Distributed BA: observations shard over the mesh ``axis``; the reduced
    camera system is psum'd across devices and solved replicated (Schur
    reduction over collectives, SURVEY.md §7.2 step 9).

    ``prob.obs_*`` leading dims must be divisible by the mesh size.
    """
    from jax.sharding import PartitionSpec as P_

    C = prob.cams.shape[0]
    P = prob.points.shape[0]

    def local(cams, points, K, obs_cam, obs_pt, obs_uv, obs_valid):
        lp = BAProblem(cams, points, K, obs_cam, obs_pt, obs_uv, obs_valid)
        return _ba_solve_impl(lp, iters, damping, C, P,
                              lambda x: jax.lax.psum(x, axis))

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P_(), P_(), P_(), P_(axis), P_(axis), P_(axis), P_(axis)),
        out_specs=(P_(), P_(), P_()),
        check_vma=False,
    )
    return jax.jit(fn)(prob.cams, prob.points, prob.K, prob.obs_cam,
                       prob.obs_pt, prob.obs_uv, prob.obs_valid)


def huberize(prob: BAProblem, delta: float) -> jax.Array:
    """Per-observation Huber IRLS weights for the current residuals:
    w = 1 for |r| <= delta, delta/|r| beyond — multiply into obs_valid-style
    weights by scaling the residual rows (robust BA)."""
    err = reprojection_errors(prob)
    w = jnp.where(err <= delta, 1.0, delta / jnp.maximum(err, 1e-8))
    return jnp.where(prob.obs_valid, w, 0.0)


def ba_solve_points_sharded(prob: BAProblem, mesh, iters: int = 10,
                            damping: float = 1e-3, axis: str = "data"):
    """Map-partitioned distributed BA: POINTS and their observations shard
    over the mesh axis (the "map blocks partitioned" layout of the north
    star); each device owns its V blocks, W strip and point updates, and only
    the reduced camera system [6C, 6C] + camera rhs are psum'd.

    Requirements: obs arrays pre-grouped so that every observation of a point
    lives on the same shard as the point (obs_pt indices are LOCAL to the
    shard), and leading dims divisible by the mesh size.
    """
    from jax.sharding import PartitionSpec as P_

    C = prob.cams.shape[0]
    P_total = prob.points.shape[0]
    n_dev = mesh.devices.size
    P_local = P_total // n_dev
    hp = jax.lax.Precision.HIGHEST

    def local(cams, points, K, obs_cam, obs_pt, obs_uv, obs_valid):
        def gn_step(state, _):
            cams, points = state
            p = BAProblem(cams, points, K, obs_cam, obs_pt, obs_uv, obs_valid)
            r, Jc, Jp = _build_normal_blocks(p)
            U = jax.ops.segment_sum(
                jnp.einsum("nri,nrj->nij", Jc, Jc, precision=hp), obs_cam, C)
            V = jax.ops.segment_sum(
                jnp.einsum("nri,nrj->nij", Jp, Jp, precision=hp), obs_pt,
                P_local)
            bc = -jax.ops.segment_sum(
                jnp.einsum("nri,nr->ni", Jc, r, precision=hp), obs_cam, C)
            bp = -jax.ops.segment_sum(
                jnp.einsum("nri,nr->ni", Jp, r, precision=hp), obs_pt,
                P_local)
            Wn = jnp.einsum("nri,nrj->nij", Jc, Jp, precision=hp)
            cp = obs_cam * P_local + obs_pt
            Wl = jax.ops.segment_sum(Wn, cp, C * P_local).reshape(
                C, P_local, 6, 3)

            Vinv = jnp.linalg.inv(V + damping * jnp.eye(3)[None])
            WVinv = jnp.einsum("cpij,pjk->cpik", Wl, Vinv, precision=hp)
            S_local = jnp.einsum("cpik,dplk->cidl", WVinv, Wl, precision=hp)
            rhs_local = jnp.einsum("cpik,pk->ci", WVinv, bp, precision=hp)

            # only the camera system crosses devices
            U = jax.lax.psum(U, axis)
            bc = jax.lax.psum(bc, axis)
            S = jax.lax.psum(S_local, axis)
            rhs = bc - jax.lax.psum(rhs_local, axis)

            S = (U + damping * jnp.eye(6)[None]).reshape(C, 6, 1, 6) * \
                jnp.eye(C)[:, None, :, None] - S
            Sm = S.reshape(C * 6, C * 6)
            maskv = jnp.arange(C * 6) >= 6
            Sm = jnp.where(maskv[:, None] & maskv[None, :], Sm, 0.0)
            Sm = Sm + jnp.diag(jnp.where(maskv, 0.0, 1.0))
            rhs_m = jnp.where(maskv, rhs.reshape(-1), 0.0)
            dx_c = jnp.linalg.solve(Sm, rhs_m).reshape(C, 6)

            dx_p = jnp.einsum(
                "pij,pj->pi", Vinv,
                bp - jnp.einsum("cpij,ci->pj", Wl, dx_c, precision=hp))

            new_cams = jax.vmap(lambda xi, T: se3_exp(xi) @ T)(dx_c, cams)
            new_points = points + dx_p

            def rmse(pp):
                e2 = jax.lax.psum((reprojection_errors(pp) ** 2).sum(), axis)
                nv = jax.lax.psum(pp.obs_valid.sum(), axis)
                return jnp.sqrt(e2 / jnp.maximum(nv, 1))

            rmse_old = rmse(p)
            rmse_new = rmse(p._replace(cams=new_cams, points=new_points))
            accept = rmse_new < rmse_old
            cams = jnp.where(accept, new_cams, cams)
            points = jnp.where(accept, new_points, points)
            return (cams, points), jnp.minimum(rmse_new, rmse_old)

        with jax.default_matmul_precision("highest"):
            (cams, points), hist = jax.lax.scan(
                gn_step, (cams, points), None, length=iters)
        return cams, points, hist

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P_(), P_(axis), P_(), P_(axis), P_(axis), P_(axis),
                  P_(axis)),
        out_specs=(P_(), P_(axis), P_()),
        check_vma=False,
    )
    return jax.jit(fn)(prob.cams, prob.points, prob.K, prob.obs_cam,
                       prob.obs_pt, prob.obs_uv, prob.obs_valid)
