"""Render a MegaDepth-layout posed-RGBD corpus from textured-plane scenes.

VERDICT r4 next #4: the depth-supervised trainer (`cli train-depth`,
mirroring reference lightning/train_depth_geoformer.py:61-133) has only
ever dry-run — real MegaDepth data is env-blocked. This builds a corpus the
unmodified MegaDepth reader (`data/megadepth.py`) consumes: per-scene npz
index files (image_paths, depth_paths, intrinsics, poses, pair_infos) over
rendered multi-plane rooms with EXACT per-pixel depth and ground-truth
world->cam poses (`geoformer_tpu.data.planes`).

    python scripts/render_depth_corpus.py --out /tmp/depth_corpus \
        --n-scenes 60 --n-val-scenes 6
    python -m geoformer_tpu.cli train-depth \
        --npz-dir /tmp/depth_corpus/index --root /tmp/depth_corpus \
        --val-npz-dir /tmp/depth_corpus/index_val --depth-pad 640 ...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def build_scene(root: str, index_dir: str, name: str, seed: int,
                n_cams: int = 8, hw=(480, 640),
                cluttered: bool = False) -> int:
    import cv2
    import h5py

    from geoformer_tpu.data.native import native_textures_mixed
    from geoformer_tpu.data.planes import look_at, render_planes, room_scene
    from geoformer_tpu.data.synthetic import mixed_texture_bank

    rng = np.random.default_rng(seed)
    tex = native_textures_mixed(6, 512, 768, seed)
    if tex is None:
        tex = mixed_texture_bank(rng, (512, 768), 6)
    planes = room_scene(rng, np.asarray(tex), cluttered=cluttered)

    H, W = hw
    f = rng.uniform(480.0, 560.0)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])

    img_dir = os.path.join(root, "scenes", name, "imgs")
    dep_dir = os.path.join(root, "scenes", name, "depths")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(dep_dir, exist_ok=True)

    target = np.array([0.0, 0.0, 8.0])
    image_paths, depth_paths, intrinsics, poses = [], [], [], []
    for i in range(n_cams):
        x = -2.2 + 4.4 * i / max(n_cams - 1, 1)
        c = np.array([x, rng.uniform(-0.4, 0.4), rng.uniform(-0.3, 0.6)])
        T = look_at(c, target + np.array([rng.uniform(-0.6, 0.6),
                                          rng.uniform(-0.4, 0.4), 0]))
        img, depth = render_planes(K, T, planes, (H, W), return_depth=True)
        ipath = f"scenes/{name}/imgs/img_{i:03d}.jpg"
        dpath = f"scenes/{name}/depths/img_{i:03d}.h5"
        cv2.imwrite(os.path.join(root, ipath),
                    (img * 255).astype(np.uint8),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        with h5py.File(os.path.join(root, dpath), "w") as hf:
            hf.create_dataset("/depth", data=depth, compression="gzip",
                              compression_opts=1)
        image_paths.append(ipath)
        depth_paths.append(dpath)
        intrinsics.append(K.astype(np.float64).reshape(-1))
        poses.append(T.astype(np.float64))

    # pair_infos in the reference npz shape: ((i0, i1), overlap, extra).
    # Arc cameras: nearby indices see mostly the same planes; the heuristic
    # overlap decays with index distance (the reader filters > 0.4).
    pair_infos = []
    for i in range(n_cams):
        for j in range(i + 1, min(i + 4, n_cams)):
            ov = float(max(0.0, 1.0 - 0.18 * (j - i)))
            pair_infos.append(((i, j), ov, 0))
    os.makedirs(index_dir, exist_ok=True)
    np.savez(
        os.path.join(index_dir, f"{name}.npz"),
        image_paths=np.array(image_paths),
        depth_paths=np.array(depth_paths),
        intrinsics=np.array(intrinsics),
        poses=np.array(poses),
        pair_infos=np.array(pair_infos, dtype=object),
    )
    return len(pair_infos)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/depth_corpus")
    ap.add_argument("--n-scenes", type=int, default=60)
    ap.add_argument("--n-val-scenes", type=int, default=6)
    ap.add_argument("--n-cams", type=int, default=8)
    ap.add_argument("--seed", type=int, default=20260820)
    ap.add_argument("--cluttered", action="store_true",
                    help="guaranteed multi-depth clutter (essential-pose "
                         "validation needs non-coplanar match sets)")
    args = ap.parse_args()

    total = 0
    for k in range(args.n_scenes):
        total += build_scene(args.out, os.path.join(args.out, "index"),
                             f"scene{k:04d}", args.seed + 31 * k,
                             n_cams=args.n_cams, cluttered=args.cluttered)
        if (k + 1) % 10 == 0:
            print(f"{k + 1}/{args.n_scenes} train scenes...", flush=True)
    vtotal = 0
    for k in range(args.n_val_scenes):
        vtotal += build_scene(args.out, os.path.join(args.out, "index_val"),
                              f"val{k:04d}", args.seed + 777_000 + 31 * k,
                              n_cams=args.n_cams, cluttered=args.cluttered)
    print(f"wrote {args.n_scenes} train scenes ({total} pairs) + "
          f"{args.n_val_scenes} val scenes ({vtotal} pairs) to {args.out}")


if __name__ == "__main__":
    main()
