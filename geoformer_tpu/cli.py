"""GeoFormer-TPU command line: train / eval / bench / infer.

Replaces the reference's per-task entry scripts (reference: eval_Hpatches.py,
eval_FIRE.py, eval_ISC.py, inference.py, lightning/train_*_geoformer.py) with
one CLI.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _model_and_params(args):
    import jax

    from geoformer_tpu.config import (
        BackboneConfig,
        CoarseTransformerConfig,
        FineTransformerConfig,
        GeoFormerConfig,
        GeoModuleConfig,
        MatchConfig,
    )
    from geoformer_tpu.models import GeoFormer
    from geoformer_tpu.train.checkpoint import load_variables

    int8_all = getattr(args, "int8_full", False)
    int8_bb = getattr(args, "int8", False) or int8_all
    cfg = GeoFormerConfig(
        backbone=BackboneConfig(int8=int8_bb),
        coarse=CoarseTransformerConfig(int8=int8_all),
        fine=FineTransformerConfig(int8=int8_all),
        match=MatchConfig(thr=args.match_thr, max_matches=args.max_matches),
        geo=GeoModuleConfig(ransac_iters=args.gam_ransac_iters,
                            max_inliers=args.gam_max_inliers,
                            use_pallas=getattr(args, "pallas", False),
                            int8=int8_all),
        use_bf16=getattr(args, "bf16", False),
    )
    model = GeoFormer(cfg)
    if args.ckpt:
        if args.ckpt.endswith((".ckpt", ".pth", ".pt")):
            # released torch checkpoints load directly: every CLI surface is
            # real-checkpoint ready the moment geoformer.ckpt exists here
            from geoformer_tpu.utils.torch_convert import (
                convert_state_dict,
                load_torch_checkpoint,
            )

            params = convert_state_dict(load_torch_checkpoint(args.ckpt))
        else:
            # exports store {'params', 'batch_stats'[, metadata]}; bare param
            # trees get wrapped, metadata (e.g. 'step') is dropped
            params = load_variables(args.ckpt)
    else:
        import jax.numpy as jnp

        key = jax.random.key(0)
        img = jnp.zeros((1, 64, 80, 1))
        params = model.init({"params": key, "ransac": key}, img, img)
    return cfg, params


def cmd_train(args):
    from geoformer_tpu.config import (
        GeoFormerConfig,
        GeoModuleConfig,
        MatchConfig,
    )
    from geoformer_tpu.train.loop import run_training

    model_cfg = GeoFormerConfig(
        match=MatchConfig(max_matches=args.max_matches, force_one_match=True),
        geo=GeoModuleConfig(ransac_iters=args.gam_ransac_iters,
                            max_inliers=args.gam_max_inliers,
                            use_pallas=args.pallas),
        use_bf16=args.bf16,
    )
    run_training(
        image_dir=args.data,
        steps=args.steps,
        batch_size=args.batch,
        image_hw=(args.height, args.width),
        ckpt_dir=args.out,
        log_every=args.log_every,
        seed=args.seed,
        model_cfg=model_cfg,
        lr=args.lr,
        warmup_steps=args.warmup,
        resume=args.resume,
        val_every=args.val_every,
        tensorboard=args.tensorboard,
        texture_style=args.texture_style,
        image_fraction=args.data_mix,
        log_figures=args.log_figures,
        sensor_aug=args.sensor_aug,
        bank_size=args.bank_size,
        bank_refresh=args.bank_refresh,
    )


def cmd_train_depth(args):
    from geoformer_tpu.config import (
        GeoFormerConfig,
        GeoModuleConfig,
        MatchConfig,
    )
    from geoformer_tpu.train.depth_loop import run_depth_training

    model_cfg = GeoFormerConfig(
        match=MatchConfig(max_matches=args.max_matches, force_one_match=True),
        geo=GeoModuleConfig(ransac_iters=args.gam_ransac_iters,
                            max_inliers=args.gam_max_inliers,
                            use_pallas=getattr(args, "pallas", False)),
        use_bf16=getattr(args, "bf16", False),
    )
    run_depth_training(
        npz_dir=args.npz_dir,
        root_dir=args.root,
        val_npz_dir=args.val_npz_dir,
        steps=args.steps,
        batch_size=args.batch,
        image_hw=(args.imsize, args.imsize),
        ckpt_dir=args.out,
        log_every=args.log_every,
        val_every=args.val_every,
        n_val_batches=args.n_val_batches,
        seed=args.seed,
        model_cfg=model_cfg,
        lr=args.lr,
        resume=args.resume,
        min_overlap_score=args.min_overlap,
        depth_pad=args.depth_pad,
    )


# Per-benchmark reference protocols (imsize, RANSAC thr in resized px):
# hpatches eval_configs/geoformer.yml:7-11; FIRE runs at 768/15
# (eval_FIRE.py protocol); ISC at 480/3 (my_helper.py).
_EVAL_PROTOCOLS = {
    "hpatches": (480, 3.0),
    "fire": (768, 15.0),
    "isc": (480, 3.0),
    "isc-cls": (480, 3.0),
}


def cmd_eval(args):
    # --imsize/--ransac-thr default to the benchmark's reference protocol
    # (they parse as None unless the user overrides them).
    proto = _EVAL_PROTOCOLS[args.benchmark]
    imsize = proto[0] if args.imsize is None else args.imsize
    ransac_thr = proto[1] if args.ransac_thr is None else args.ransac_thr
    cfg, params = _model_and_params(args)
    if args.benchmark == "hpatches":
        from geoformer_tpu.eval.hpatches import eval_hpatches

        out = eval_hpatches(params, cfg, args.data, imsize=imsize,
                            ransac_thr=ransac_thr,
                            max_seqs=args.max_seqs)
    elif args.benchmark == "fire":
        from geoformer_tpu.eval.fire import eval_fire

        out = eval_fire(params, cfg, args.data, imsize=imsize,
                        ransac_thr=ransac_thr)
    elif args.benchmark == "isc":
        from geoformer_tpu.eval.isc import eval_isc

        out = eval_isc(params, cfg, args.data, imsize=imsize,
                       ransac_thr=ransac_thr)
    else:
        from geoformer_tpu.eval.isc import eval_isc_classification

        # --data is a txt of `query refer label` lines (my_helper.py:225-324)
        out = eval_isc_classification(params, cfg, args.data,
                                      imsize=imsize,
                                      ransac_thr=ransac_thr)
    print(json.dumps(out, indent=2, default=float))
    if getattr(args, "json_out", None):
        with open(args.json_out, "w") as f:
            json.dump(out, f, default=float)


def cmd_parity(args):
    """Real-data readiness drill: converted checkpoint -> HPatches protocol
    -> diff vs the reference's published block with a pass/fail gate.

    The reference README block (reference: README.md:110-120, protocol
    eval_configs/geoformer.yml hpatch: imsize 480, no_match_upscale) is the
    default expectation; --expect overrides it for rehearsals on synthetic
    corpora. Exits non-zero when any AUC threshold misses the gate."""
    import sys

    import numpy as np

    from geoformer_tpu.eval.hpatches import eval_hpatches

    cfg, params = _model_and_params(args)
    out = eval_hpatches(params, cfg, args.hpatches, imsize=args.imsize,
                        ransac_thr=args.ransac_thr, max_seqs=args.max_seqs)
    expect = [float(x) for x in args.expect.split(",")]
    rec = {"auc_a": out.get("auc_a"), "expected_auc_a": expect,
           "gate_pt": args.gate_pt, "est_failed": out.get("est_failed"),
           "n_pairs": out.get("n_pairs"),
           "mean_matches": out.get("mean_matches")}
    if out.get("auc_a"):
        delta = (np.asarray(out["auc_a"]) - np.asarray(expect)) * 100.0
        rec["delta_pt"] = [round(float(d), 2) for d in delta]
        # one-sided gate: beating the block is a pass, trailing it by more
        # than gate_pt at any threshold is a fail
        rec["pass"] = bool((delta >= -args.gate_pt).all())
    else:
        rec["pass"] = False
    print(json.dumps(rec, default=float))
    if not rec["pass"]:
        sys.exit(1)


def cmd_infer(args):
    import numpy as np

    from geoformer_tpu.eval.matcher import BatchedMatcher, load_gray

    # load before model init: fail fast on bad paths, not after a long compile
    im0, sc0 = load_gray(args.image0, args.imsize)
    im1, sc1 = load_gray(args.image1, args.imsize)
    cfg, params = _model_and_params(args)
    seq_mesh = None
    if args.seq_shard > 1:
        # sequence-parallel: shard this one pair's tokens over the mesh
        # (high-resolution path, docs/SCALING.md)
        import jax
        from jax.sharding import Mesh

        devs = jax.devices()
        assert args.seq_shard <= len(devs), \
            f"--seq-shard {args.seq_shard} > {len(devs)} devices"
        seq_mesh = Mesh(np.array(devs[:args.seq_shard]), ("seq",))
    matcher = BatchedMatcher(cfg, params, batch_size=1, seq_mesh=seq_mesh)
    t0 = time.time()
    (mk0, mk1, conf, geo), = matcher.match_batch([im0], [im1],
                                                 return_geo=True)
    print(f"{len(mk0)} matches in {time.time() - t0:.2f}s "
          f"(GAM: has_H={geo['has_H']} inliers={geo['num_inliers']})")
    if args.draw:
        from geoformer_tpu.utils.plotting import make_matching_figure

        make_matching_figure(im0, im1, mk0, mk1,
                             text=[f"GeoFormer-TPU", f"{len(mk0)} matches"],
                             path=args.draw)
        print(f"figure -> {args.draw}")
    if args.draw_geo:
        from geoformer_tpu.utils.plotting import make_geo_window_figure

        make_geo_window_figure(im0, im1, geo["H"], geo["has_H"],
                               scale=cfg.coarse_scale,
                               window_size=cfg.geo.window_size,
                               path=args.draw_geo)
        print(f"GAM window figure -> {args.draw_geo}")
    mk0 = mk0 * np.array(sc0)
    mk1 = mk1 * np.array(sc1)
    if args.out:
        np.save(args.out, np.concatenate([mk0, mk1, conf[:, None]], axis=1))
        print(f"saved -> {args.out}")


def cmd_export(args):
    from geoformer_tpu.serving import save_bundle

    cfg, params = _model_and_params(args)
    platforms = ([p.strip() for p in args.platforms.split(",") if p.strip()]
                 if args.platforms else None)
    save_bundle(args.out, cfg, params, hw=(args.height, args.width),
                batch=args.batch, platforms=platforms)
    print(f"serving bundle ({args.batch}x{args.height}x{args.width}, "
          f"platforms={platforms or 'current backend'}) -> {args.out}")


def cmd_localize(args):
    from geoformer_tpu.eval.localize_driver import (
        load_pairs_txt,
        run_localization,
    )
    from geoformer_tpu.eval.matcher import BatchedMatcher, load_gray
    from geoformer_tpu.eval.sfm_localize import parse_queries_with_intrinsics

    if not args.scan_dir and not (args.nvm and args.database):
        raise SystemExit("localize needs either --scan-dir (dense InLoc "
                         "mode) or both --nvm and --database (SfM mode)")
    cfg, params = _model_and_params(args)
    matcher = BatchedMatcher(cfg, params, batch_size=1)
    import numpy as np

    def match_pairs_fn(n0, n1):
        im0, sc0 = load_gray(os.path.join(args.images, n0), args.imsize)
        im1, sc1 = load_gray(os.path.join(args.images, n1), args.imsize)
        (mk0, mk1, _), = matcher.match_batch([im0], [im1])
        return np.concatenate([mk0 * np.array(sc0), mk1 * np.array(sc1)],
                              axis=1)

    queries = parse_queries_with_intrinsics(args.queries)
    query_pairs = load_pairs_txt(args.query_pairs)
    if args.scan_dir:
        # InLoc-style dense-depth mode: 3D from per-db-image depth scans
        # (eval/inloc.py), no NVM/triangulation needed.
        from geoformer_tpu.eval.inloc import (
            load_db_scans,
            localize_queries_dense,
        )
        from geoformer_tpu.eval.sfm_localize import write_pose_file

        db_names = sorted({n for _, n in query_pairs})
        scans = load_db_scans(args.scan_dir, db_names)
        qmatches = {}
        for qn, dbn in query_pairs:
            if dbn not in scans:
                continue
            qmatches.setdefault(qn, {})[dbn] = match_pairs_fn(qn, dbn)
        poses = localize_queries_dense(queries, qmatches, scans,
                                       ransac_thr_px=args.ransac_thr)
        os.makedirs(args.out, exist_ok=True)
        write_pose_file(poses, os.path.join(args.out, "poses.txt"))
    else:
        run_localization(
            nvm_path=args.nvm,
            db_path=args.database,
            out_dir=args.out,
            match_pairs_fn=match_pairs_fn,
            queries=queries,
            query_pairs=query_pairs,
            db_pairs=load_pairs_txt(args.db_pairs) if args.db_pairs else None,
            intrinsics_txt=args.intrinsics_txt,
            covis_topk=args.covis_topk,
            ransac_thr_px=args.ransac_thr,
        )
    print(f"poses -> {os.path.join(args.out, 'poses.txt')}")


def cmd_slam(args):
    import glob as _glob

    import numpy as np

    from geoformer_tpu.engine.slam import (
        run_planar_slam,
        save_trajectory,
        trajectory_drift,
    )
    from geoformer_tpu.eval.matcher import BatchedMatcher, load_gray

    paths = sorted(_glob.glob(os.path.join(args.images, args.glob)))
    if len(paths) < 2:
        raise SystemExit(f"need >=2 frames, found {len(paths)} "
                         f"in {args.images}/{args.glob}")
    frames = []
    for p in paths:
        im, _ = load_gray(p, args.imsize)
        frames.append(im)
    shapes = {f.shape for f in frames}
    if len(shapes) != 1:
        raise SystemExit(f"frames must share one shape, got {shapes}")

    cfg, params = _model_and_params(args)
    matcher = BatchedMatcher(cfg, params, batch_size=1)

    def match_fn(i, j):
        (mk0, mk1, _), = matcher.match_batch([frames[i]], [frames[j]])
        return mk0, mk1

    res = run_planar_slam(frames, match_fn, loop_stride=args.loop_stride,
                          ransac_thr=args.ransac_thr)
    out = {"frames": len(frames),
           "edges_ok": sum(e["ok"] for e in res["edges"]),
           "edges_total": len(res["edges"])}
    if args.gt:
        gt = np.load(args.gt)["H"] if args.gt.endswith(".npz") \
            else np.loadtxt(args.gt)[:, 1:].reshape(-1, 3, 3)
        hw = frames[0].shape
        out["corner_drift_chained_px"] = round(
            trajectory_drift(res["H_chained"], gt, hw), 3)
        out["corner_drift_optimized_px"] = round(
            trajectory_drift(res["H_traj"], gt, hw), 3)
    if args.out:
        save_trajectory(res["H_traj"], args.out)
        out["trajectory"] = args.out
    print(json.dumps(out))


def main():
    p = argparse.ArgumentParser("geoformer-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--ckpt", default=None)
        sp.add_argument("--match-thr", type=float, default=0.2)
        sp.add_argument("--max-matches", type=int, default=1024)
        sp.add_argument("--gam-ransac-iters", type=int, default=256)
        sp.add_argument("--gam-max-inliers", type=int, default=1024)
        sp.add_argument("--imsize", type=int, default=480)
        sp.add_argument("--bf16", action="store_true",
                        help="bf16 compute path (params stay f32)")
        sp.add_argument("--pallas", action="store_true",
                        help="Pallas GAM attention kernels (TPU)")
        sp.add_argument("--int8", action="store_true",
                        help="dynamic int8 backbone convs (eval-only; 2x MXU "
                             "peak on v5e, checkpoints unchanged)")
        sp.add_argument("--int8-full", action="store_true",
                        help="int8 backbone AND transformer projections/MLPs "
                             "(eval-only; verify quality with selfcheck)")

    t = sub.add_parser("train")
    t.add_argument("--data", default=None, help="image dir (else procedural)")
    t.add_argument("--data-mix", type=float, default=1.0,
                   help="with --data: per-sample probability of drawing from "
                        "the image dir (rest procedural); 1.0 = images only")
    t.add_argument("--steps", type=int, default=1000)
    t.add_argument("--batch", type=int, default=8)
    t.add_argument("--height", type=int, default=480)
    t.add_argument("--width", type=int, default=640)
    t.add_argument("--out", default="checkpoints")
    t.add_argument("--log-every", type=int, default=50)
    t.add_argument("--seed", type=int, default=66)
    t.add_argument("--max-matches", type=int, default=512)
    t.add_argument("--gam-ransac-iters", type=int, default=256)
    t.add_argument("--gam-max-inliers", type=int, default=512)
    t.add_argument("--lr", type=float, default=0.0,
                   help="override true LR (default: canonical*bs/64)")
    t.add_argument("--warmup", type=int, default=0,
                   help="override warmup in actual steps")
    t.add_argument("--resume", action="store_true")
    t.add_argument("--bank-size", type=int, default=256,
                   help="procedural texture bank size")
    t.add_argument("--bank-refresh", type=int, default=0,
                   help="regenerate the procedural bank every N steps "
                        "(0 = fixed bank; >0 makes the corpus unbounded)")
    t.add_argument("--sensor-aug", action="store_true",
                   help="camera-realism augmentation on both views "
                        "(defocus/vignette/shot-read-noise/JPEG; the offline "
                        "lever against the real-photo domain gap)")
    t.add_argument("--texture-style", choices=("mixed", "structured"),
                   default="mixed",
                   help="procedural bank family mix (mixed adds dead-leaves "
                        "+ fBm natural-statistics textures)")
    t.add_argument("--val-every", type=int, default=0)
    t.add_argument("--tensorboard", action="store_true")
    t.add_argument("--log-figures", action="store_true",
                   help="log a val-batch match figure to TensorBoard at each "
                        "validation (extra inference compile)")
    t.add_argument("--bf16", action="store_true",
                   help="bf16 compute path (params stay f32)")
    t.add_argument("--pallas", action="store_true",
                   help="Pallas GAM kernels (masked-KV + box-window)")
    t.set_defaults(fn=cmd_train)

    td = sub.add_parser("train-depth",
                        help="depth-supervised (MegaDepth/ScanNet) training")
    td.add_argument("--npz-dir", required=True, help="train scene npz dir")
    td.add_argument("--root", required=True, help="dataset root dir")
    td.add_argument("--val-npz-dir", default=None, help="val scene npz dir")
    td.add_argument("--steps", type=int, default=1000)
    td.add_argument("--batch", type=int, default=2)
    td.add_argument("--imsize", type=int, default=640,
                    help="square pad size (MegaDepth protocol)")
    td.add_argument("--out", default="checkpoints_depth")
    td.add_argument("--log-every", type=int, default=50)
    td.add_argument("--val-every", type=int, default=500)
    td.add_argument("--n-val-batches", type=int, default=8)
    td.add_argument("--seed", type=int, default=66)
    td.add_argument("--max-matches", type=int, default=512)
    td.add_argument("--gam-ransac-iters", type=int, default=256)
    td.add_argument("--gam-max-inliers", type=int, default=512)
    td.add_argument("--lr", type=float, default=0.0)
    td.add_argument("--resume", action="store_true")
    td.add_argument("--min-overlap", type=float, default=0.4)
    td.add_argument("--depth-pad", type=int, default=2000)
    td.add_argument("--bf16", action="store_true",
                    help="bf16 compute path (params stay f32)")
    td.add_argument("--pallas", action="store_true",
                    help="Pallas GAM attention kernels (TPU)")
    td.set_defaults(fn=cmd_train_depth)

    e = sub.add_parser("eval")
    e.add_argument("benchmark", choices=["hpatches", "fire", "isc",
                                         "isc-cls"])
    e.add_argument("--data", required=True)
    e.add_argument("--ransac-thr", type=float, default=None,
                   help="RANSAC threshold in resized px "
                        "(default: the benchmark's reference protocol)")
    e.add_argument("--max-seqs", type=int, default=None)
    e.add_argument("--json-out", default=None,
                   help="also write the result dict to this file as "
                        "compact JSON (robust machine parsing)")
    common(e)
    # common() defaults --imsize to 480; eval derives per-benchmark protocol
    # defaults (hpatches/isc 480, FIRE 768) from None instead.
    e.set_defaults(fn=cmd_eval, imsize=None)

    lz = sub.add_parser("localize",
                        help="Aachen-style visual localization end-to-end")
    lz.add_argument("--nvm", default=None, help="reference NVM model "
                    "(required unless --scan-dir)")
    lz.add_argument("--database", default=None, help="COLMAP db with ids "
                    "(required unless --scan-dir)")
    lz.add_argument("--scan-dir", default=None,
                    help="InLoc-style dense mode: directory of per-db-image "
                         "npz scans (depth/K/T_w2c); replaces the NVM + "
                         "triangulation path")
    lz.add_argument("--images", required=True, help="image root dir")
    lz.add_argument("--queries", required=True,
                    help="queries_with_intrinsics.txt")
    lz.add_argument("--query-pairs", required=True,
                    help="txt: query db_image per line")
    lz.add_argument("--db-pairs", default=None,
                    help="txt of db pairs (default: covis from NVM)")
    lz.add_argument("--intrinsics-txt", default=None,
                    help="database_intrinsics.txt (Aachen v1)")
    lz.add_argument("--covis-topk", type=int, default=20)
    lz.add_argument("--ransac-thr", type=float, default=12.0)
    lz.add_argument("--out", default="localization_out")
    common(lz)
    lz.set_defaults(fn=cmd_localize)

    sl = sub.add_parser("slam",
                        help="planar SLAM over an image sequence")
    sl.add_argument("--images", required=True, help="frame directory")
    sl.add_argument("--glob", default="*.png")
    sl.add_argument("--loop-stride", type=int, default=0,
                    help=">1 adds (i, i+stride) loop-closure edges")
    sl.add_argument("--ransac-thr", type=float, default=3.0)
    sl.add_argument("--gt", default=None,
                    help="GT trajectory (npz with H [K,3,3], or txt)")
    sl.add_argument("--out", default=None, help="trajectory txt output")
    common(sl)
    sl.set_defaults(fn=cmd_slam)

    ex = sub.add_parser(
        "export",
        help="AOT-export a self-contained serving bundle (StableHLO + "
             "weights; reloads with geoformer_tpu.serving.load_bundle "
             "without any model code)")
    ex.add_argument("--out", default="matcher.gfmz")
    ex.add_argument("--height", type=int, default=480)
    ex.add_argument("--width", type=int, default=640)
    ex.add_argument("--batch", type=int, default=1)
    ex.add_argument("--platforms", default=None,
                    help="comma-separated lowering targets, e.g. tpu,cpu "
                         "(default: current backend)")
    common(ex)
    ex.set_defaults(fn=cmd_export)

    pa = sub.add_parser(
        "parity",
        help="readiness drill: run the HPatches protocol on a (torch or npz) "
             "checkpoint and gate the AUC block against the reference's "
             "published numbers")
    pa.add_argument("--hpatches", required=True,
                    help="hpatches-sequences-release root")
    pa.add_argument("--ransac-thr", type=float, default=3.0)
    pa.add_argument("--max-seqs", type=int, default=None)
    pa.add_argument("--expect", default="0.5154,0.7206,0.7997,0.8768",
                    help="expected AUC@1,3,5,10 (default: the reference "
                         "README block)")
    pa.add_argument("--gate-pt", type=float, default=1.0,
                    help="max allowed shortfall per threshold, in points")
    common(pa)
    pa.set_defaults(fn=cmd_parity)

    i = sub.add_parser("infer")
    i.add_argument("image0")
    i.add_argument("image1")
    i.add_argument("--out", default=None)
    i.add_argument("--draw", default=None, help="write a match figure (png)")
    i.add_argument("--draw-geo", default=None,
                   help="write the GAM geometry-window debug overlay (png): "
                        "where each image0 cell attends in image1 under the "
                        "fitted homography (cross_draw counterpart)")
    i.add_argument("--seq-shard", type=int, default=0,
                   help="shard the pair's tokens over this many devices "
                        "(sequence-parallel high-res matching)")
    common(i)
    i.set_defaults(fn=cmd_infer)

    args = p.parse_args()
    from geoformer_tpu.core.cache import enable_compile_cache
    from geoformer_tpu.core.platform import respect_platform_env

    respect_platform_env()
    enable_compile_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
