"""COLMAP interoperability: sqlite database + binary model I/O + keypoint
quantization.

Re-implementation of the visual-localization plumbing (reference:
eval_tool/immatch/utils/colmap/database.py:144-236,
colmap/read_write_model.py:77-505, localize_sfm_helper.py:173-215), written
against the public COLMAP file formats. Detector-free matchers emit matches
(not repeatable keypoints), so quantize_keypoints merges nearby match
endpoints into shared keypoint ids — required for COLMAP-style triangulation
and for feeding our own engine (engine/sfm.py).
"""

from __future__ import annotations

import sqlite3
import struct
from typing import Dict, List, Tuple

import numpy as np

MAX_IMAGE_ID = 2 ** 31 - 1

_SCHEMA = """
CREATE TABLE IF NOT EXISTS cameras (
    camera_id INTEGER PRIMARY KEY AUTOINCREMENT NOT NULL,
    model INTEGER NOT NULL, width INTEGER NOT NULL, height INTEGER NOT NULL,
    params BLOB, prior_focal_length INTEGER NOT NULL);
CREATE TABLE IF NOT EXISTS images (
    image_id INTEGER PRIMARY KEY AUTOINCREMENT NOT NULL,
    name TEXT NOT NULL UNIQUE, camera_id INTEGER NOT NULL,
    prior_qw REAL, prior_qx REAL, prior_qy REAL, prior_qz REAL,
    prior_tx REAL, prior_ty REAL, prior_tz REAL,
    CONSTRAINT image_id_check CHECK(image_id >= 0 and image_id < 2147483647),
    FOREIGN KEY(camera_id) REFERENCES cameras(camera_id));
CREATE TABLE IF NOT EXISTS keypoints (
    image_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    FOREIGN KEY(image_id) REFERENCES images(image_id) ON DELETE CASCADE);
CREATE TABLE IF NOT EXISTS descriptors (
    image_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    FOREIGN KEY(image_id) REFERENCES images(image_id) ON DELETE CASCADE);
CREATE TABLE IF NOT EXISTS matches (
    pair_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB);
CREATE TABLE IF NOT EXISTS two_view_geometries (
    pair_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    config INTEGER NOT NULL, F BLOB, E BLOB, H BLOB, qvec BLOB, tvec BLOB);
CREATE INDEX IF NOT EXISTS index_name ON images(name);
"""


def image_ids_to_pair_id(id1: int, id2: int) -> int:
    if id1 > id2:
        id1, id2 = id2, id1
    return id1 * MAX_IMAGE_ID + id2


def pair_id_to_image_ids(pair_id: int) -> Tuple[int, int]:
    id2 = pair_id % MAX_IMAGE_ID
    id1 = (pair_id - id2) // MAX_IMAGE_ID
    return id1, id2


def _blob(a: np.ndarray) -> bytes:
    return np.ascontiguousarray(a).tobytes()


class ColmapDatabase:
    """Minimal COLMAP-compatible sqlite database writer/reader."""

    def __init__(self, path: str):
        self.conn = sqlite3.connect(path)
        self.conn.executescript(_SCHEMA)

    def close(self):
        self.conn.commit()
        self.conn.close()

    def add_camera(self, model: int, width: int, height: int, params,
                   prior_focal_length: bool = False, camera_id=None) -> int:
        cur = self.conn.execute(
            "INSERT INTO cameras VALUES (?, ?, ?, ?, ?, ?)",
            (camera_id, model, width, height,
             _blob(np.asarray(params, np.float64)), prior_focal_length))
        return cur.lastrowid

    def add_image(self, name: str, camera_id: int, image_id=None) -> int:
        nan = float("nan")
        cur = self.conn.execute(
            "INSERT INTO images VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
            (image_id, name, camera_id, nan, nan, nan, nan, nan, nan, nan))
        return cur.lastrowid

    def add_keypoints(self, image_id: int, kps: np.ndarray):
        kps = np.asarray(kps, np.float32)
        assert kps.ndim == 2 and kps.shape[1] in (2, 4, 6)
        self.conn.execute("INSERT INTO keypoints VALUES (?, ?, ?, ?)",
                          (image_id, *kps.shape, _blob(kps)))

    def add_matches(self, id1: int, id2: int, matches: np.ndarray):
        matches = np.asarray(matches, np.uint32)
        assert matches.ndim == 2 and matches.shape[1] == 2
        if id1 > id2:
            matches = matches[:, ::-1]
        self.conn.execute(
            "INSERT INTO matches VALUES (?, ?, ?, ?)",
            (image_ids_to_pair_id(id1, id2), *matches.shape, _blob(matches)))

    def add_two_view_geometry(self, id1: int, id2: int, matches: np.ndarray,
                              F=None, E=None, H=None, config: int = 2):
        matches = np.asarray(matches, np.uint32)
        if id1 > id2:
            matches = matches[:, ::-1]
        eye = np.eye(3, dtype=np.float64)
        self.conn.execute(
            "INSERT INTO two_view_geometries VALUES "
            "(?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
            (image_ids_to_pair_id(id1, id2), *matches.shape, _blob(matches),
             config, _blob(np.asarray(F if F is not None else eye)),
             _blob(np.asarray(E if E is not None else eye)),
             _blob(np.asarray(H if H is not None else eye)),
             _blob(np.array([1.0, 0, 0, 0])), _blob(np.zeros(3))))

    def read_keypoints(self, image_id: int) -> np.ndarray:
        row = self.conn.execute(
            "SELECT rows, cols, data FROM keypoints WHERE image_id=?",
            (image_id,)).fetchone()
        r, c, data = row
        return np.frombuffer(data, np.float32).reshape(r, c)

    def read_matches(self, id1: int, id2: int) -> np.ndarray:
        row = self.conn.execute(
            "SELECT rows, cols, data FROM matches WHERE pair_id=?",
            (image_ids_to_pair_id(id1, id2),)).fetchone()
        r, c, data = row
        return np.frombuffer(data, np.uint32).reshape(r, c)


# ---------------------------------------------------------------- model io

def write_cameras_binary(cameras: Dict[int, dict], path: str):
    """cameras: {id: {'model_id', 'width', 'height', 'params'}}."""
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cameras)))
        for cid, c in cameras.items():
            f.write(struct.pack("<iiQQ", cid, c["model_id"], c["width"],
                                c["height"]))
            f.write(np.asarray(c["params"], np.float64).tobytes())


def read_cameras_binary(path: str) -> Dict[int, dict]:
    n_params = {0: 3, 1: 4, 2: 4, 3: 5, 4: 8, 5: 8, 6: 12, 7: 5, 8: 4,
                9: 5, 10: 12}
    out = {}
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            cid, model_id, w, h = struct.unpack("<iiQQ", f.read(24))
            params = np.frombuffer(f.read(8 * n_params[model_id]), np.float64)
            out[cid] = {"model_id": model_id, "width": w, "height": h,
                        "params": params}
    return out


def write_images_binary(images: Dict[int, dict], path: str):
    """images: {id: {'qvec' [4], 'tvec' [3], 'camera_id', 'name',
    'xys' [N,2], 'point3D_ids' [N]}}."""
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for iid, im in images.items():
            f.write(struct.pack("<i", iid))
            f.write(np.asarray(im["qvec"], np.float64).tobytes())
            f.write(np.asarray(im["tvec"], np.float64).tobytes())
            f.write(struct.pack("<i", im["camera_id"]))
            f.write(im["name"].encode() + b"\x00")
            xys = np.asarray(im.get("xys", np.zeros((0, 2))), np.float64)
            ids = np.asarray(im.get("point3D_ids", np.zeros(0)), np.int64)
            f.write(struct.pack("<Q", len(xys)))
            # COLMAP stores (x, y, point3D_id) with the id as int64
            buf = b"".join(struct.pack("<ddq", x, y, int(i))
                           for (x, y), i in zip(xys, ids))
            f.write(buf)


def read_images_binary(path: str) -> Dict[int, dict]:
    out = {}
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            (iid,) = struct.unpack("<i", f.read(4))
            qvec = np.frombuffer(f.read(32), np.float64)
            tvec = np.frombuffer(f.read(24), np.float64)
            (cam_id,) = struct.unpack("<i", f.read(4))
            name = b""
            while True:
                ch = f.read(1)
                if ch == b"\x00":
                    break
                name += ch
            (npts,) = struct.unpack("<Q", f.read(8))
            xys = np.zeros((npts, 2))
            ids = np.zeros(npts, np.int64)
            for k in range(npts):
                x, y, pid = struct.unpack("<ddq", f.read(24))
                xys[k] = (x, y)
                ids[k] = pid
            out[iid] = {"qvec": qvec, "tvec": tvec, "camera_id": cam_id,
                        "name": name.decode(), "xys": xys,
                        "point3D_ids": ids}
    return out


def write_points3d_binary(points: Dict[int, dict], path: str):
    """points: {id: {'xyz' [3], 'rgb' [3], 'error', 'track' [(img, kp)...]}}."""
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(points)))
        for pid, p in points.items():
            f.write(struct.pack("<Q", pid))
            f.write(np.asarray(p["xyz"], np.float64).tobytes())
            f.write(np.asarray(p.get("rgb", [0, 0, 0]), np.uint8).tobytes())
            f.write(struct.pack("<d", p.get("error", 0.0)))
            track = p.get("track", [])
            f.write(struct.pack("<Q", len(track)))
            for (img_id, kp_id) in track:
                f.write(struct.pack("<ii", img_id, kp_id))


def read_points3d_binary(path: str) -> Dict[int, dict]:
    out = {}
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            (pid,) = struct.unpack("<Q", f.read(8))
            xyz = np.frombuffer(f.read(24), np.float64)
            rgb = np.frombuffer(f.read(3), np.uint8)
            (err,) = struct.unpack("<d", f.read(8))
            (tlen,) = struct.unpack("<Q", f.read(8))
            track = [struct.unpack("<ii", f.read(8)) for _ in range(tlen)]
            out[pid] = {"xyz": xyz, "rgb": rgb, "error": err, "track": track}
    return out


# ------------------------------------------------------- keypoint merging

def quantize_keypoints(fpts: np.ndarray, kp_data: dict, psize: int = 48,
                       dthres: float = 4.0) -> List[int]:
    """Merge nearby match endpoints into shared keypoint ids
    (localize_sfm_helper.py:173-215 semantics): the image is gridded into
    psize cells; points within a cell closer than dthres to an existing
    center merge into it (running mean), otherwise become new keypoints.

    kp_data: {'kps': list of points, 'kp_means': {cell: {'means', 'kids'}}}.
    Returns the keypoint id for each input point.
    """
    fpt_ids = []
    cpts = (np.asarray(fpts) // psize * psize).astype(np.int64)
    for cpt, fpt in zip(cpts, np.asarray(fpts, np.float64)):
        cell = tuple(cpt)
        kps = kp_data["kps"]
        kp_dict = kp_data["kp_means"]
        if cell not in kp_dict:
            kid = len(kps)
            kps.append(fpt)
            kp_dict[cell] = {"means": [fpt], "kids": [kid]}
        else:
            entry = kp_dict[cell]
            centers = entry["means"]
            dist = np.linalg.norm(fpt - np.asarray(centers), axis=1)
            cid = int(np.argmin(dist))
            if dist[cid] < dthres:
                centers[cid] = (centers[cid] + fpt) / 2
                kid = entry["kids"][cid]
                kps[kid] = centers[cid]
            else:
                kid = len(kps)
                kps.append(fpt)
                centers.append(fpt)
                entry["kids"].append(kid)
        fpt_ids.append(kid)
    return fpt_ids
