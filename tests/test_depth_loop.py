"""End-to-end depth-supervised training loop over a synthetic npz scene.

Covers the wiring the reference exercises via train_depth_geoformer +
PL_GeoFormer (reference: lightning/train_depth_geoformer.py:61-133,
lightning_depth_geoformer.py:95-207): scene stream -> sharded depth step ->
pose-AUC validation -> monitored checkpointing -> resume artifacts.
"""

import json
import os

import cv2
import h5py
import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: full loops / 8-device compiles / torch cross-tests

from geoformer_tpu.config import GeoFormerConfig, GeoModuleConfig, MatchConfig


def _make_scene(root, npz_dir, n_imgs=3, size=64):
    """One synthetic MegaDepth-format scene: textured plane at depth 5 seen
    from laterally translated cameras (all geometry exactly consistent)."""
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "imgs"), exist_ok=True)
    os.makedirs(os.path.join(root, "depths"), exist_ok=True)
    os.makedirs(npz_dir, exist_ok=True)
    K = np.array([[80.0, 0, size / 2], [0, 80.0, size / 2], [0, 0, 1]],
                 np.float32)
    depth = 5.0
    # base texture rendered per-camera by projecting the world plane
    tex = (rng.random((256, 256)) * 255).astype(np.uint8)
    image_paths, depth_paths, poses, intrinsics = [], [], [], []
    for i in range(n_imgs):
        # camera i at x = 0.4 * i, looking down +z at the z=depth plane
        tx = 0.4 * i
        # pixel (u,v) sees world point ((u-cx)/f*depth + tx, ...)
        u, v = np.meshgrid(np.arange(size), np.arange(size))
        wx = (u - K[0, 2]) / K[0, 0] * depth + tx
        wy = (v - K[1, 2]) / K[1, 1] * depth
        # sample the texture on a 0.02 world grid
        im = tex[(np.clip(wy / 0.05, 0, 255)).astype(int) % 256,
                 (np.clip(wx / 0.05, 0, 255)).astype(int) % 256]
        ip = f"imgs/im{i}.png"
        dp = f"depths/d{i}.h5"
        cv2.imwrite(os.path.join(root, ip), im)
        with h5py.File(os.path.join(root, dp), "w") as f:
            f.create_dataset("depth", data=np.full((size, size), depth,
                                                   np.float32))
        image_paths.append(ip)
        depth_paths.append(dp)
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -tx  # world -> cam: subtract camera position
        poses.append(T)
        intrinsics.append(K.flatten())
    pair_infos = np.array(
        [((0, 1), 0.9, None), ((1, 2), 0.9, None), ((0, 2), 0.8, None)],
        dtype=object)
    np.savez(os.path.join(npz_dir, "scene0.npz"),
             image_paths=np.array(image_paths),
             depth_paths=np.array(depth_paths),
             intrinsics=np.array(intrinsics),
             poses=np.array(poses),
             pair_infos=pair_infos)


def test_depth_training_end_to_end(tmp_path):
    from geoformer_tpu.train.depth_loop import run_depth_training

    root = str(tmp_path / "data")
    npz = str(tmp_path / "npz")
    _make_scene(root, npz)
    out = str(tmp_path / "ckpt")

    cfg = GeoFormerConfig(
        match=MatchConfig(max_matches=32, force_one_match=True),
        geo=GeoModuleConfig(ransac_iters=32, max_inliers=32),
    )
    state, best = run_depth_training(
        npz_dir=npz, root_dir=root, val_npz_dir=npz,
        steps=2, batch_size=2, image_hw=(64, 64), ckpt_dir=out,
        log_every=1, val_every=2, n_val_batches=1,
        model_cfg=cfg, lr=1e-4, depth_pad=64)
    assert int(state.step) == 2
    # metrics jsonl has train lines and one val line with pose AUC keys
    lines = [json.loads(l) for l in
             open(os.path.join(out, "metrics.jsonl"))]
    train_lines = [l for l in lines if "loss" in l]
    val_lines = [l for l in lines if "auc@10" in l]
    assert train_lines and val_lines
    v = val_lines[-1]
    for k in ("auc@5", "auc@10", "auc@20", "val_loss", "prec@5e-04"):
        assert k in v, v
        assert np.isfinite(v[k])
    assert best["auc@10"] >= 0.0
    # monitored checkpoint + final params exist
    assert os.path.exists(os.path.join(out, "params_final.npz"))
    steps_saved = [d for d in os.listdir(out) if d.isdigit()]
    assert steps_saved, os.listdir(out)


def test_scene_stream_shapes(tmp_path):
    from geoformer_tpu.data.megadepth import scene_balanced_stream

    root = str(tmp_path / "data")
    npz = str(tmp_path / "npz")
    _make_scene(root, npz)
    stream = scene_balanced_stream(npz, root, batch=2, img_resize=64,
                                   depth_pad=64)
    b = next(stream)
    assert b["image0"].shape == (2, 64, 64, 1)
    assert b["depth0"].shape == (2, 64, 64)
    assert b["mask0"].shape == (2, 8, 8)
    assert b["T_0to1"].shape == (2, 4, 4)


def test_monitored_checkpoint_keeps_best(tmp_path):
    """save_checkpoint_monitored retains the top-k steps ranked by the
    monitored metric (Lightning save_top_k semantics)."""
    import jax.numpy as jnp

    from geoformer_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint_monitored,
    )
    from geoformer_tpu.train.trainer import TrainState

    out = str(tmp_path / "ck")
    aucs = {1: 0.1, 2: 0.5, 3: 0.3, 4: 0.9, 5: 0.2}
    for step, auc in aucs.items():
        st = TrainState(params={"w": jnp.full((2,), float(step))},
                        batch_stats={}, opt_state={},
                        step=jnp.asarray(step, jnp.int32))
        save_checkpoint_monitored(out, st, step, {"auc@10": auc}, keep=2)
    kept = sorted(int(d) for d in os.listdir(out) if d.isdigit())
    assert kept == [2, 4], kept  # the two best by auc@10

    # restore loads the latest kept step
    tmpl = TrainState(params={"w": jnp.zeros((2,))}, batch_stats={},
                      opt_state={}, step=jnp.asarray(0, jnp.int32))
    st = restore_checkpoint(out, tmpl)
    assert int(st.step) == 4


def test_resume_reads_newest_not_best(tmp_path):
    """The depth loop's two-directory layout: --resume restores the plain
    rolling 'latest' (ckpt_dir) even when every recent step validates worse
    than older ones in the monitored top-k dir (ckpt_dir/best) — a resume
    must never silently roll training back to a 'better' older step."""
    import jax.numpy as jnp

    from geoformer_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
        save_checkpoint_monitored,
    )
    from geoformer_tpu.train.trainer import TrainState

    out = str(tmp_path / "ck")
    # step 2 validates best; steps 3-5 regress. The monitored dir keeps 2,
    # the plain dir keeps the newest regardless of metric.
    for step, auc in {1: 0.2, 2: 0.9, 3: 0.4, 4: 0.3, 5: 0.1}.items():
        st = TrainState(params={"w": jnp.full((2,), float(step))},
                        batch_stats={}, opt_state={},
                        step=jnp.asarray(step, jnp.int32))
        save_checkpoint(out, st, step, keep=3)
        save_checkpoint_monitored(os.path.join(out, "best"), st, step,
                                  {"auc@10": auc}, keep=1)
    tmpl = TrainState(params={"w": jnp.zeros((2,))}, batch_stats={},
                      opt_state={}, step=jnp.asarray(0, jnp.int32))
    assert int(restore_checkpoint(out, tmpl).step) == 5
    assert int(restore_checkpoint(os.path.join(out, "best"),
                                  tmpl).step) == 2
