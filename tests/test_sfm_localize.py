"""Visual-localization back half: synthetic scene -> matches -> native
triangulation -> PnP query localization -> benchmark pose file; plus NVM
parsing, covis pairs, and text-model round trips."""

import os

import numpy as np
import pytest

from geoformer_tpu.eval.colmap_io import (
    camera_K,
    read_model,
    write_model,
)
from geoformer_tpu.eval.localization import collect_quantized_matches
from geoformer_tpu.eval.sfm_localize import (
    covis_pairs_from_nvm,
    create_empty_model_from_nvm_and_database,
    localize_queries,
    parse_nvm,
    parse_queries_with_intrinsics,
    qvec2rotmat,
    rotmat2qvec,
    triangulate_model,
    write_pose_file,
)


def _look_at_pose(tx):
    """World->cam pose of a camera at (tx, 0, 0) looking down +z."""
    T = np.eye(4)
    T[:3, 3] = [-tx, 0, 0]
    return T


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    # well-separated 3D points in front of all cameras
    pts = np.stack([
        rng.uniform(-2, 3.5, 60),
        rng.uniform(-2, 2, 60),
        rng.uniform(6, 10, 60),
    ], -1)
    # prune points that project too close together (quantizer merges < 4 px)
    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
    cams = {f"db{i}.jpg": _look_at_pose(0.5 * i) for i in range(4)}

    def project(T, X):
        pc = X @ T[:3, :3].T + T[:3, 3]
        uv = (pc @ K.T)
        return uv[:, :2] / uv[:, 2:], pc[:, 2]

    keep = np.ones(len(pts), bool)
    uv0, _ = project(list(cams.values())[0], pts)
    for i in range(len(pts)):
        if not keep[i]:
            continue
        d = np.linalg.norm(uv0 - uv0[i], axis=1)
        d[i] = np.inf
        keep &= (d > 12) | (np.arange(len(pts)) <= i)
    pts = pts[keep]
    return pts, K, cams, project


def test_rotmat_qvec_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = qvec2rotmat(q)
        q2 = rotmat2qvec(R)
        np.testing.assert_allclose(qvec2rotmat(q2), R, atol=1e-9)


def test_end_to_end_localization(tmp_path, scene):
    pts, K, cams, project = scene
    names = list(cams)
    in_view = {}
    uvs = {}
    for n, T in cams.items():
        uv, z = project(T, pts)
        ok = (z > 0) & (uv[:, 0] > 0) & (uv[:, 0] < 640) & \
            (uv[:, 1] > 0) & (uv[:, 1] < 480)
        in_view[n] = ok
        uvs[n] = uv

    # simulated matcher output over consecutive db pairs
    pair_matches = {}
    for a, b in zip(names[:-1], names[1:]):
        ok = in_view[a] & in_view[b]
        pair_matches[(a, b)] = np.concatenate(
            [uvs[a][ok], uvs[b][ok]], -1).astype(np.float32)

    keypoints, matches_ids = collect_quantized_matches(pair_matches,
                                                       dthres=2.0)
    cameras = {1: {"model_id": 1, "width": 640, "height": 480,
                   "params": np.array([400.0, 400.0, 320, 240])}}
    images = {}
    for i, (n, T) in enumerate(cams.items(), start=1):
        images[i] = {"qvec": rotmat2qvec(T[:3, :3]), "tvec": T[:3, 3],
                     "camera_id": 1, "name": n,
                     "xys": np.zeros((0, 2)),
                     "point3D_ids": np.zeros(0, np.int64)}

    images, points3d = triangulate_model(cameras, images, keypoints,
                                         matches_ids)
    assert len(points3d) >= 10
    # triangulated points match the GT world points
    gt_err = []
    for p in points3d.values():
        d = np.linalg.norm(pts - p["xyz"], axis=1).min()
        gt_err.append(d)
    assert np.median(gt_err) < 0.05, np.median(gt_err)

    # model round-trips through binary and text formats
    for ext in (".bin", ".txt"):
        d = str(tmp_path / f"model{ext[1:]}")
        write_model(cameras, images, points3d, d, ext)
        c2, i2, p2 = read_model(d, ext)
        assert len(c2) == 1 and len(i2) == len(images)
        assert len(p2) == len(points3d)
        pid = next(iter(points3d))
        np.testing.assert_allclose(p2[pid]["xyz"], points3d[pid]["xyz"],
                                   atol=1e-6)
        np.testing.assert_allclose(i2[1]["tvec"], images[1]["tvec"],
                                   atol=1e-9)

    # query: a new camera pose, matched against two db images
    Tq = _look_at_pose(0.75)
    Tq[:3, 3] += [0, -0.2, 0.1]
    uvq, zq = project(Tq, pts)
    okq = (zq > 0) & (uvq[:, 0] > 0) & (uvq[:, 0] < 640) & \
        (uvq[:, 1] > 0) & (uvq[:, 1] < 480)
    qmatches = {}
    for n in names[:2]:
        ok = okq & in_view[n]
        qmatches[n] = np.concatenate([uvq[ok], uvs[n][ok]],
                                     -1).astype(np.float32)
    qcam = {"model_id": 1, "width": 640, "height": 480,
            "params": np.array([400.0, 400.0, 320, 240])}
    poses = localize_queries(cameras, images, points3d, {"q.jpg": qcam},
                             {"q.jpg": qmatches}, ransac_thr_px=4.0)
    p = poses["q.jpg"]
    assert p["ok"] and p["num_inliers"] >= 10
    R_est = qvec2rotmat(p["qvec"])
    rot_err = np.rad2deg(np.arccos(np.clip(
        (np.trace(R_est.T @ Tq[:3, :3]) - 1) / 2, -1, 1)))
    assert rot_err < 1.0, rot_err
    assert np.linalg.norm(p["tvec"] - Tq[:3, 3]) < 0.1

    # benchmark-format pose file
    pose_file = str(tmp_path / "poses.txt")
    write_pose_file(poses, pose_file)
    line = open(pose_file).read().split()
    assert line[0] == "q.jpg" and len(line) == 8


def _write_nvm(path, cams, project, pts):
    """Minimal NVM_V3 writer for test fixtures (inverse of parse_nvm)."""
    with open(path, "w") as f:
        f.write("NVM_V3\n\n")
        f.write(f"{len(cams)}\n")
        names = list(cams)
        for n, T in cams.items():
            R = T[:3, :3]
            c = -R.T @ T[:3, 3]
            q = rotmat2qvec(R)
            f.write(f"./{n} 400.0 {' '.join(map(str, q))} "
                    f"{' '.join(map(str, c))} 0 0\n")
        f.write("\n")
        vis = []
        for pi, X in enumerate(pts[:20]):
            track = []
            for ii, (n, T) in enumerate(cams.items()):
                uv, z = project(T, X[None])
                if z[0] > 0:
                    track.append((ii, pi, uv[0, 0], uv[0, 1]))
            if len(track) >= 2:
                vis.append((X, track))
        f.write(f"{len(vis)}\n")
        for X, track in vis:
            meas = " ".join(f"{i} {fi} {u} {v}" for i, fi, u, v in track)
            f.write(f"{' '.join(map(str, X))} 128 128 128 "
                    f"{len(track)} {meas}\n")


def test_nvm_parse_covis_and_empty_model(tmp_path, scene):
    from geoformer_tpu.eval.colmap_io import ColmapDatabase

    pts, K, cams, project = scene
    nvm = str(tmp_path / "model.nvm")
    _write_nvm(nvm, cams, project, pts)

    names, images, points = parse_nvm(nvm)
    assert len(names) == len(cams)
    assert len(points) >= 10
    # tvec = -R c must reproduce the GT world->cam translation
    for n, T in cams.items():
        np.testing.assert_allclose(images["./" + n]["tvec"], T[:3, 3],
                                   atol=1e-6)

    pairs = covis_pairs_from_nvm(nvm, topk=2)
    assert pairs and all(a != b for a, b in pairs)

    # database with matching names -> empty model
    db_path = str(tmp_path / "db.db")
    db = ColmapDatabase(db_path)
    for n in cams:
        cid = db.add_camera(1, 640, 480, [400.0, 400.0, 320, 240])
        db.add_image(n, cid)
    db.close()
    out = str(tmp_path / "empty")
    cameras, imgs = create_empty_model_from_nvm_and_database(
        nvm, db_path, out, ext=".txt")
    assert len(imgs) == len(cams)
    c2, i2, p2 = read_model(out, ".txt")
    assert len(p2) == 0 and len(i2) == len(cams)
    K2 = camera_K(next(iter(c2.values())))
    np.testing.assert_allclose(K2, K, atol=1e-9)


def test_parse_queries_with_intrinsics(tmp_path):
    p = str(tmp_path / "queries.txt")
    with open(p, "w") as f:
        f.write("query/day1.jpg SIMPLE_RADIAL 1600 1200 1469.2 800 600 "
                "-0.0353019\n")
    q = parse_queries_with_intrinsics(p)
    cam = q["query/day1.jpg"]
    assert cam["model_id"] == 2 and cam["width"] == 1600
    K = camera_K(cam)
    assert K[0, 0] == pytest.approx(1469.2)


def test_run_localization_driver(tmp_path, scene):
    """Full driver: NVM + db -> covis pairs -> matches -> triangulation ->
    query localization -> benchmark pose file."""
    from geoformer_tpu.eval.colmap_io import ColmapDatabase
    from geoformer_tpu.eval.localize_driver import run_localization

    pts, K, cams, project = scene
    nvm = str(tmp_path / "model.nvm")
    _write_nvm(nvm, cams, project, pts)
    db_path = str(tmp_path / "db.db")
    db = ColmapDatabase(db_path)
    for n in cams:
        cid = db.add_camera(1, 640, 480, [400.0, 400.0, 320, 240])
        db.add_image(n, cid)
    db.close()

    uvs, okv = {}, {}
    for n, T in cams.items():
        uv, z = project(T, pts)
        okv[n] = (z > 0) & (uv[:, 0] > 0) & (uv[:, 0] < 640) & \
            (uv[:, 1] > 0) & (uv[:, 1] < 480)
        uvs[n] = uv
    Tq = _look_at_pose(0.75)
    Tq[:3, 3] += [0, -0.15, 0.05]
    uvq, zq = project(Tq, pts)
    okq = (zq > 0) & (uvq[:, 0] > 0) & (uvq[:, 0] < 640) & \
        (uvq[:, 1] > 0) & (uvq[:, 1] < 480)

    def match_pairs_fn(a, b):
        ua, oa = (uvq, okq) if a == "q.jpg" else (uvs[a], okv[a])
        ub, ob = (uvq, okq) if b == "q.jpg" else (uvs[b], okv[b])
        ok = oa & ob
        return np.concatenate([ua[ok], ub[ok]], -1).astype(np.float32)

    queries = {"q.jpg": {"model_id": 1, "width": 640, "height": 480,
                         "params": np.array([400.0, 400.0, 320, 240])}}
    out = str(tmp_path / "loc")
    poses = run_localization(
        nvm_path=nvm, db_path=db_path, out_dir=out,
        match_pairs_fn=match_pairs_fn, queries=queries,
        query_pairs=[("q.jpg", n) for n in list(cams)[:2]],
        covis_topk=3, quant_dthres=2.0, ransac_thr_px=4.0, log=lambda *a: None)
    p = poses["q.jpg"]
    assert p["ok"], p
    R_est = qvec2rotmat(p["qvec"])
    rot_err = np.rad2deg(np.arccos(np.clip(
        (np.trace(R_est.T @ Tq[:3, :3]) - 1) / 2, -1, 1)))
    assert rot_err < 1.0 and np.linalg.norm(p["tvec"] - Tq[:3, 3]) < 0.1
    assert os.path.exists(os.path.join(out, "poses.txt"))
    assert os.path.exists(os.path.join(out, "sfm_model", "points3D.bin"))
    assert os.path.exists(os.path.join(out, "keypoints.h5"))


def test_covis_from_model_and_empty_from_reference(tmp_path, scene):
    from geoformer_tpu.eval.sfm_localize import (
        covis_pairs_from_model,
        create_empty_model_from_reference_model,
    )

    pts, K, cams, project = scene
    # build a tiny triangulated model via the usual path
    uvs, okv = {}, {}
    for n, T in cams.items():
        uv, z = project(T, pts)
        okv[n] = (z > 0) & (uv[:, 0] > 0) & (uv[:, 0] < 640) & \
            (uv[:, 1] > 0) & (uv[:, 1] < 480)
        uvs[n] = uv
    names = list(cams)
    pair_matches = {}
    for a, b in zip(names[:-1], names[1:]):
        ok = okv[a] & okv[b]
        pair_matches[(a, b)] = np.concatenate(
            [uvs[a][ok], uvs[b][ok]], -1).astype(np.float32)
    keypoints, matches_ids = collect_quantized_matches(pair_matches,
                                                      dthres=2.0)
    cameras = {1: {"model_id": 1, "width": 640, "height": 480,
                   "params": np.array([400.0, 400.0, 320, 240])}}
    images = {i: {"qvec": rotmat2qvec(T[:3, :3]), "tvec": T[:3, 3],
                  "camera_id": 1, "name": n, "xys": np.zeros((0, 2)),
                  "point3D_ids": np.zeros(0, np.int64)}
              for i, (n, T) in enumerate(cams.items(), start=1)}
    images, points3d = triangulate_model(cameras, images, keypoints,
                                         matches_ids)

    pairs = covis_pairs_from_model(images, points3d, topk=2)
    assert pairs and all(a != b for a, b in pairs)
    # every db image with points appears as a source
    assert len({a for a, _ in pairs}) >= 3

    ref = str(tmp_path / "refmodel")
    write_model(cameras, images, points3d, ref, ".bin")
    out = str(tmp_path / "empty_from_ref")
    c2, i2 = create_empty_model_from_reference_model(ref, out)
    c3, i3, p3 = read_model(out, ".bin")
    assert len(p3) == 0 and len(i3) == len(images)
    assert all(len(im["xys"]) == 0 for im in i3.values())
