"""InLoc-style dense-depth localization (eval/inloc.py)."""

import numpy as np
import pytest

from geoformer_tpu.eval.inloc import (
    load_db_scans,
    localize_queries_dense,
    unproject_depth,
)
from geoformer_tpu.eval.sfm_localize import qvec2rotmat


K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
H, W = 480, 640


def _look_at(center, target):
    z = np.asarray(target, float) - np.asarray(center, float)
    z /= np.linalg.norm(z)
    x = np.cross([0, -1, 0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    T = np.eye(4)
    T[:3, :3] = np.stack([x, y, z], 0)
    T[:3, 3] = -T[:3, :3] @ np.asarray(center, float)
    return T


def _plane_depth(T_w2c, n_w, d_w):
    """Analytic [H, W] depth of the plane {n.X = d} seen from T_w2c."""
    R, t = T_w2c[:3, :3], T_w2c[:3, 3]
    yy, xx = np.mgrid[0:H, 0:W]
    rays = np.linalg.solve(
        K, np.stack([xx, yy, np.ones_like(xx)], 0).reshape(3, -1)
    )                                                       # cam-frame dirs
    # world: X = R^T (z * ray - t); plane: n.X = d -> solve for z
    n_c = R @ n_w                                           # normal in cam
    num = d_w - n_w @ (-R.T @ t)
    den = n_c @ rays
    with np.errstate(divide="ignore", invalid="ignore"):
        z = num / den
    z = np.where((den != 0) & (z > 0.1), z, 0.0)
    return z.reshape(H, W)


@pytest.fixture(scope="module")
def scene():
    n_w = np.array([0.2, 0.1, -1.0])
    n_w /= np.linalg.norm(n_w)
    d_w = n_w @ np.array([0.0, 0.0, 8.0])                   # plane through z=8
    db = {f"db{i}.jpg": _look_at([-1.0 + i, 0, 0], [0, 0, 8.0])
          for i in range(3)}
    scans = {n: {"depth": _plane_depth(T, n_w, d_w), "K": K, "T_w2c": T}
             for n, T in db.items()}
    Tq = _look_at([0.4, 0.2, 0.3], [0.2, 0, 8.0])
    return n_w, d_w, db, scans, Tq


def test_unproject_depth_roundtrip(scene):
    n_w, d_w, db, scans, _ = scene
    name, T = next(iter(db.items()))
    uv = np.array([[100.5, 200.2], [500.0, 50.0], [-5.0, 10.0]])
    xyz, ok = unproject_depth(uv, scans[name]["depth"], K, T)
    assert ok[0] and ok[1] and not ok[2]          # third is out of image
    # lifted points lie on the plane and reproject to the query pixels
    assert abs(n_w @ xyz[0] - d_w) < 0.05
    pc = xyz[0] @ T[:3, :3].T + T[:3, 3]
    uvp = (K @ pc)[:2] / (K @ pc)[2]
    np.testing.assert_allclose(uvp, uv[0], atol=1.0)


def test_localize_queries_dense_recovers_pose(scene):
    n_w, d_w, db, scans, Tq = scene

    def project(T, X):
        pc = X @ T[:3, :3].T + T[:3, 3]
        uv = pc @ K.T
        return uv[:, :2] / uv[:, 2:], pc[:, 2]

    # ground-truth correspondences: sample plane points visible in both
    rng = np.random.default_rng(0)
    X = []
    e1 = np.cross(n_w, [0, 1, 0])
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(n_w, e1)
    O = d_w * n_w
    for _ in range(200):
        X.append(O + rng.uniform(-3, 3) * e1 + rng.uniform(-2, 2) * e2)
    X = np.asarray(X)
    uq, zq = project(Tq, X)
    okq = (zq > 0) & (uq[:, 0] > 2) & (uq[:, 0] < W - 2) & \
        (uq[:, 1] > 2) & (uq[:, 1] < H - 2)
    qm = {}
    for name, T in db.items():
        ud, zd = project(T, X)
        okd = okq & (zd > 0) & (ud[:, 0] > 2) & (ud[:, 0] < W - 2) & \
            (ud[:, 1] > 2) & (ud[:, 1] < H - 2)
        qm[name] = np.concatenate([uq[okd], ud[okd]], 1).astype(np.float32)

    qcam = {"q.jpg": {"model_id": 1, "width": W, "height": H,
                      "params": np.array([400.0, 400.0, 320, 240])}}
    res = localize_queries_dense(qcam, {"q.jpg": qm}, scans,
                                 ransac_thr_px=4.0)
    p = res["q.jpg"]
    assert p["ok"], p
    R_est = qvec2rotmat(p["qvec"])
    rot_err = np.rad2deg(np.arccos(np.clip(
        (np.trace(R_est.T @ Tq[:3, :3]) - 1) / 2, -1, 1)))
    assert rot_err < 1.0
    assert np.linalg.norm(p["tvec"] - Tq[:3, 3]) < 0.15


def test_localize_dense_too_few_matches(scene):
    _, _, db, scans, _ = scene
    qcam = {"q.jpg": {"model_id": 1, "width": W, "height": H,
                      "params": np.array([400.0, 400.0, 320, 240])}}
    res = localize_queries_dense(
        qcam, {"q.jpg": {list(db)[0]: np.zeros((2, 4), np.float32)}}, scans)
    assert not res["q.jpg"]["ok"]


def test_load_db_scans_roundtrip(tmp_path, scene):
    _, _, db, scans, _ = scene
    name = list(db)[0]
    np.savez(tmp_path / "db0.npz", depth=scans[name]["depth"], K=K,
             T_w2c=db[name])
    out = load_db_scans(str(tmp_path), [name, "missing.jpg"])
    assert set(out) == {name}
    np.testing.assert_allclose(out[name]["depth"], scans[name]["depth"])
