"""End-to-end localization accuracy on a rendered synthetic scene (VERDICT r3 #7).

Renders a NON-planar 3-plane scene (back wall + slanted floor + side wall,
each a textured quad; per-camera rendering is exact plane-induced
homography warps composited far-to-near), writes the Aachen-style inputs
(NVM posed db model, COLMAP db, queries_with_intrinsics.txt, pair lists),
runs `cli localize` with the trained matcher end-to-end (match -> quantize
-> triangulate -> PnP), and scores query poses against ground truth at the
Aachen recall thresholds (0.25m/2deg, 0.5m/5deg, 5m/10deg).

    python scripts/localize_protocol.py [--ckpt ...] [--out /tmp/loc_proto]

Pipeline shape mirrored from the reference's eval_aachen driver
(reference: eval_tool/immatch/eval_aachen.py:1-87), which delegates to an
absent hloc submodule — this protocol exercises the native replacement.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np


from geoformer_tpu.data.planes import (  # noqa: E402
    look_at as _look_at,
    render_planes,
)


def _render(K, T, planes, hw):
    return render_planes(K, T, planes, hw)


def _rotmat2qvec(R):
    from geoformer_tpu.eval.sfm_localize import rotmat2qvec

    return rotmat2qvec(R)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/tpu_r3_main/params_final.npz")
    ap.add_argument("--out", default="/tmp/loc_protocol")
    ap.add_argument("--seed", type=int, default=20260819)
    ap.add_argument("--n-db", type=int, default=8)
    ap.add_argument("--n-query", type=int, default=4)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--pallas", action="store_true")
    args = ap.parse_args()

    from geoformer_tpu.core.platform import respect_platform_env

    respect_platform_env()

    import cv2

    from geoformer_tpu.data.native import native_textures
    from geoformer_tpu.eval.colmap_io import ColmapDatabase
    from geoformer_tpu.eval.sfm_localize import rotmat2qvec

    rng = np.random.default_rng(args.seed)
    H, W = 480, 640
    K = np.array([[520.0, 0, 320], [0, 520.0, 240], [0, 0, 1]])

    # --- scene: back wall (z=8), slanted floor, left wall. Units = meters.
    tex = np.asarray(native_textures(3, 512, 768, args.seed))
    planes = [
        # back wall: x in [-5, 5], y in [-3, 3] at z = 8
        (np.array([-5.0, -3.0, 8.0]), np.array([10.0, 0, 0]),
         np.array([0, 6.0, 0]), tex[0]),
        # floor: y = +2 near, sloping from z=2 to z=8
        (np.array([-5.0, 2.2, 2.0]), np.array([10.0, 0, 0]),
         np.array([0, 1.2, 6.0]), tex[1]),
        # left wall: x = -4.5, z in [2, 8]
        (np.array([-4.5, -3.0, 2.0]), np.array([0, 0, 6.0]),
         np.array([0, 6.0, 0]), tex[2]),
    ]

    # --- cameras: db arc + interleaved held-out queries
    target = np.array([0.0, 0.0, 8.0])
    db_cams = {}
    for i in range(args.n_db):
        x = -2.1 + 4.2 * i / max(args.n_db - 1, 1)
        c = np.array([x, rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.4)])
        db_cams[f"db{i:02d}.jpg"] = _look_at(
            c, target + np.array([rng.uniform(-0.5, 0.5),
                                  rng.uniform(-0.3, 0.3), 0]))
    q_cams = {}
    for i in range(args.n_query):
        x = -1.6 + 3.2 * i / max(args.n_query - 1, 1)
        c = np.array([x + 0.25, rng.uniform(-0.25, 0.25),
                      0.35 + rng.uniform(0, 0.25)])
        q_cams[f"q{i:02d}.jpg"] = _look_at(
            c, target + np.array([rng.uniform(-0.4, 0.4), 0, 0]))

    img_dir = os.path.join(args.out, "images")
    os.makedirs(img_dir, exist_ok=True)
    for name, T in {**db_cams, **q_cams}.items():
        im = _render(K, T, planes, (H, W))
        cv2.imwrite(os.path.join(img_dir, name),
                    (im * 255).astype(np.uint8))
    print(f"rendered {len(db_cams)} db + {len(q_cams)} query images",
          flush=True)

    # --- 3D points for NVM tracks (plane grid samples, visibility-checked)
    pts = []
    for origin, e1, e2, _ in planes:
        for s in np.linspace(0.05, 0.95, 8):
            for t in np.linspace(0.05, 0.95, 6):
                pts.append(origin + s * e1 + t * e2)
    pts = np.asarray(pts)

    def project(T, X):
        pc = X @ T[:3, :3].T + T[:3, 3]
        uv = pc @ K.T
        return uv[:, :2] / uv[:, 2:], pc[:, 2]

    # --- NVM (posed db model) + COLMAP database
    nvm_path = os.path.join(args.out, "model.nvm")
    names = list(db_cams)
    with open(nvm_path, "w") as f:
        f.write("NVM_V3\n\n")
        f.write(f"{len(db_cams)}\n")
        for n, T in db_cams.items():
            R = T[:3, :3]
            c = -R.T @ T[:3, 3]
            q = rotmat2qvec(R)
            f.write(f"./{n} {K[0, 0]} {' '.join(map(str, q))} "
                    f"{' '.join(map(str, c))} 0 0\n")
        f.write("\n")
        vis = []
        for pi, X in enumerate(pts):
            track = []
            for ii, (n, T) in enumerate(db_cams.items()):
                uv, z = project(T, X[None])
                if z[0] > 0.2 and 0 < uv[0, 0] < W and 0 < uv[0, 1] < H:
                    track.append((ii, pi, uv[0, 0], uv[0, 1]))
            if len(track) >= 2:
                vis.append((X, track))
        f.write(f"{len(vis)}\n")
        for X, track in vis:
            meas = " ".join(f"{i} {fi} {u} {v}" for i, fi, u, v in track)
            f.write(f"{' '.join(map(str, X))} 128 128 128 "
                    f"{len(track)} {meas}\n")

    db_path = os.path.join(args.out, "db.db")
    if os.path.exists(db_path):
        os.remove(db_path)
    db = ColmapDatabase(db_path)
    for n in names:
        cid = db.add_camera(1, W, H, [K[0, 0], K[1, 1], K[0, 2], K[1, 2]])
        db.add_image(n, cid)
    db.close()

    queries_txt = os.path.join(args.out, "queries.txt")
    with open(queries_txt, "w") as f:
        for n in q_cams:
            f.write(f"{n} PINHOLE {W} {H} {K[0, 0]} {K[1, 1]} "
                    f"{K[0, 2]} {K[1, 2]}\n")
    qpairs_txt = os.path.join(args.out, "query_pairs.txt")
    with open(qpairs_txt, "w") as f:
        for qn, Tq in q_cams.items():
            cq = -Tq[:3, :3].T @ Tq[:3, 3]
            byd = sorted(names, key=lambda n: np.linalg.norm(
                (-db_cams[n][:3, :3].T @ db_cams[n][:3, 3]) - cq))
            for n in byd[:4]:
                f.write(f"{qn} {n}\n")

    # --- run the CLI end-to-end
    out_dir = os.path.join(args.out, "run")
    cmd = [sys.executable, "-m", "geoformer_tpu.cli", "localize",
           "--nvm", nvm_path, "--database", db_path, "--images", img_dir,
           "--queries", queries_txt, "--query-pairs", qpairs_txt,
           "--out", out_dir, "--ckpt", args.ckpt, "--imsize", "480",
           "--covis-topk", "3"]
    if args.bf16:
        cmd.append("--bf16")
    if args.pallas:
        cmd.append("--pallas")
    print("running:", " ".join(cmd), flush=True)
    r = subprocess.run(cmd)
    if r.returncode:
        sys.exit(r.returncode)

    # --- score vs GT at Aachen thresholds
    est = {}
    from geoformer_tpu.eval.sfm_localize import qvec2rotmat

    with open(os.path.join(out_dir, "poses.txt")) as f:
        for line in f:
            p = line.split()
            est[p[0]] = (np.asarray(p[1:5], float), np.asarray(p[5:8], float))
    rows = []
    for qn, Tq in q_cams.items():
        if qn not in est:
            rows.append((qn, np.inf, np.inf))
            continue
        qv, tv = est[qn]
        R_est = qvec2rotmat(qv)
        rot_err = np.rad2deg(np.arccos(np.clip(
            (np.trace(R_est.T @ Tq[:3, :3]) - 1) / 2, -1, 1)))
        c_est = -R_est.T @ tv
        c_gt = -Tq[:3, :3].T @ Tq[:3, 3]
        rows.append((qn, float(np.linalg.norm(c_est - c_gt)), float(rot_err)))
        print(f"{qn}: center err {rows[-1][1]:.3f} m, rot {rot_err:.2f} deg",
              flush=True)
    ths = [(0.25, 2.0), (0.5, 5.0), (5.0, 10.0)]
    recall = [float(np.mean([(d <= dm and r <= rd) for _, d, r in rows]))
              for dm, rd in ths]
    rec = {"protocol": "localize_synthetic_3plane", "seed": args.seed,
           "n_db": len(db_cams), "n_query": len(q_cams),
           "recall@0.25m,2deg": recall[0], "recall@0.5m,5deg": recall[1],
           "recall@5m,10deg": recall[2],
           "median_center_err_m": float(np.median([d for _, d, _ in rows])),
           "median_rot_err_deg": float(np.median([r for _, _, r in rows]))}
    print(json.dumps(rec))
    sys.exit(0 if recall[2] == 1.0 else 1)


if __name__ == "__main__":
    main()
