"""Self-contained quality benchmark: synthetic HPatches-style protocol.

Generates held-out textured pairs under known homographies (the same family
the self-supervised trainer uses, but a disjoint seed), runs the full matcher
+ on-device RANSAC, and reports the HPatches-style corner-error metrics
(correctness and AUC @ 1/3/5/10 px). With no public dataset on this machine,
this is the stand-in for the README parity block — the protocol and metric
code are identical to eval/hpatches.py.

Usage: python scripts/selfcheck_eval.py --ckpt checkpoints/tpu_r3_main/params_final.npz
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/tpu_r3_main/params_final.npz")
    ap.add_argument("--pairs", type=int, default=40)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--seed", type=int, default=123456)
    ap.add_argument("--ransac-thr", type=float, default=3.0)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="dynamic int8 backbone convs (eval-only)")
    ap.add_argument("--int8-full", action="store_true",
                    help="int8 backbone AND transformer projections/MLPs")
    ap.add_argument("--image", action="append", default=None,
                    help="real grayscale image(s) to use as the base texture "
                         "instead of procedural ones (cycled across pairs); "
                         "tests real-photo statistics vs the synthetic "
                         "training distribution; pass --image real-photos "
                         "to use every photograph shipped in installed "
                         "packages (sklearn china/flower, matplotlib "
                         "grace_hopper, pygame camera_rgb)")
    args = ap.parse_args()

    from geoformer_tpu.core.cache import enable_compile_cache
    from geoformer_tpu.core.platform import respect_platform_env

    respect_platform_env()
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from geoformer_tpu.config import (
        BackboneConfig,
        CoarseTransformerConfig,
        FineTransformerConfig,
        GeoFormerConfig,
        GeoModuleConfig,
        MatchConfig,
    )
    from geoformer_tpu.data.native import native_textures, native_warp
    from geoformer_tpu.data.synthetic import procedural_texture
    from geoformer_tpu.eval.hpatches import fit_homography_np
    from geoformer_tpu.eval.metrics import cal_error_auc, correctness
    from geoformer_tpu.geometry.homography import sample_homography
    from geoformer_tpu.models import GeoFormer
    from geoformer_tpu.train.checkpoint import load_variables

    H, W = args.height, args.width
    rng = np.random.default_rng(args.seed)

    if args.image == ["real-photos"]:
        import glob as _glob
        import sysconfig

        site = sysconfig.get_paths()["purelib"]
        args.image = sorted(sum((_glob.glob(os.path.join(site, g)) for g in (
            "sklearn/datasets/images/*.jpg",
            "matplotlib/mpl-data/sample_data/grace_hopper.jpg",
            "pygame/docs/generated/_images/camera_rgb.jpg",
        )), []))
        assert args.image, "no package photos found"
        print(f"real-photos mode: {len(args.image)} photographs "
              "(CONTAMINATED vs corpora built before the holdout split — "
              "prefer --image held-out-photos)")
    elif args.image == ["held-out-photos"]:
        # Photos quarantined OUT of data/textures by
        # scripts/build_texture_corpus.py (HOLDOUT list): the only clean
        # real-photo generalization probe on this machine.
        import sysconfig

        site = sysconfig.get_paths()["purelib"]
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from build_texture_corpus import HOLDOUT

        args.image = [os.path.join(site, h) for h in HOLDOUT]
        print(f"held-out-photos mode: {len(args.image)} photographs "
              "(never in the training corpus)")
    if args.image:
        import cv2

        ims = []
        for p in args.image:
            im = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
            assert im is not None, p
            ims.append(cv2.resize(im, (W, H)).astype(np.float32) / 255.0)
        base = np.stack([ims[i % len(ims)] for i in range(args.pairs)])
    else:
        base = native_textures(args.pairs, H, W, args.seed)
        if base is None:
            base = np.stack([procedural_texture(rng, (H, W))
                             for _ in range(args.pairs)])
    keys = jax.random.split(jax.random.key(args.seed), args.pairs)
    Hs = np.asarray(jax.vmap(
        lambda k: sample_homography(k, (H, W)))(keys))
    warped = native_warp(base, Hs)
    if warped is None:
        from geoformer_tpu.ops.image_warp import warp_image

        warped = np.asarray(warp_image(
            jnp.asarray(base[..., None]), jnp.asarray(Hs)))[..., 0]

    cfg = GeoFormerConfig(
        backbone=BackboneConfig(int8=args.int8 or args.int8_full),
        coarse=CoarseTransformerConfig(int8=args.int8_full),
        fine=FineTransformerConfig(int8=args.int8_full),
        match=MatchConfig(max_matches=1024),
        geo=GeoModuleConfig(ransac_iters=256, max_inliers=1024,
                            use_pallas=args.pallas,
                            int8=args.int8_full),
        use_bf16=args.bf16,
    )
    model = GeoFormer(cfg)
    variables = load_variables(args.ckpt)

    @jax.jit
    def fwd(v, i0, i1):
        return model.apply(v, i0, i1, rngs={"ransac": jax.random.key(0)})

    B = 4
    dists, n_matches = [], []
    t_match = 0.0
    for s in range(0, args.pairs, B):
        i0 = jnp.asarray(base[s:s + B, :, :, None])
        i1 = jnp.asarray(warped[s:s + B, :, :, None])
        t0 = time.time()
        out = fwd(variables, i0, i1)
        mk0 = np.asarray(out.fine.mkpts0)
        mk1 = np.asarray(out.fine.mkpts1)
        ok = np.asarray(out.fine.valid)
        t_match += time.time() - t0
        for b in range(i0.shape[0]):
            p0, p1 = mk0[b][ok[b]], mk1[b][ok[b]]
            n_matches.append(len(p0))
            Hp, _ = fit_homography_np(p0, p1, args.ransac_thr)
            if Hp is None:
                dists.append(np.nan)
                continue
            corners = np.array([[0, 0, 1], [0, H - 1, 1], [W - 1, 0, 1],
                                [W - 1, H - 1, 1]], np.float64)
            wr = corners @ Hs[s + b].T
            wr = wr[:, :2] / wr[:, 2:]
            wp = corners @ Hp.T
            wp = wp[:, :2] / wp[:, 2:]
            dists.append(float(np.linalg.norm(wr - wp, axis=1).mean()))

    thres = (1, 3, 5, 10)
    print(json.dumps({
        "pairs": args.pairs,
        "mean_matches": float(np.mean(n_matches)),
        "match_time_per_pair_s": t_match / args.pairs,
        "correct@1/3/5/10": correctness(dists, thres).round(4).tolist(),
        "auc@1/3/5/10": cal_error_auc(dists, thres).round(4).tolist(),
        "failed": int(np.isnan(dists).sum()),
    }))


if __name__ == "__main__":
    main()
