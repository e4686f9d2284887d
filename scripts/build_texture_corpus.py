"""Harvest the real/structured images shipped inside installed packages
into a training texture corpus for `cli train --data`.

This machine has no public datasets (zero egress), but installed packages
carry ~140 images: labmaze's 1024x1024 surface textures, pygame's example
sprites/photos, sklearn's china/flower photographs, matplotlib's
grace_hopper portrait. After a flatness filter (mean gradient magnitude)
~48 survive — a small real-image mix-in bank that attacks the measured
real-photo domain gap (RESULTS.md: synthetic-trained AUC@1px drops
0.55 -> 0.35 on real photographs).

A held-out set of photographs (HOLDOUT below) is ALWAYS excluded from the
corpus and written to --holdout-dir instead: the real-photo generalization
probe (scripts/selfcheck_eval.py --image held-out-photos) must never see
its images inside the training corpus, or it measures photometric
adaptation instead of generalization (round-2 contamination finding).

Usage:
    python scripts/build_texture_corpus.py --out data/textures
    python -m geoformer_tpu.cli train --data data/textures --data-mix 0.5
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np
from PIL import Image

import sysconfig

SITE = sysconfig.get_paths()["purelib"]
CANDIDATE_GLOBS = [
    "labmaze/assets/**/*.png",
    "pygame/examples/data/*.png",
    "pygame/examples/data/*.jpg",
    "pygame/examples/data/*.bmp",
    "pygame/examples/data/*.gif",
    # only the raw camera photo + intro art (the other camera_* files are
    # reprocessed copies of the same scene — masks, thresholds, colorspaces)
    "pygame/docs/generated/_images/camera_rgb.jpg",
    "pygame/docs/generated/_images/intro_*.jpg",
    "sklearn/datasets/images/*.jpg",
    "matplotlib/mpl-data/sample_data/*.jpg",
    "matplotlib/mpl-data/sample_data/*.png",
]

# Photographs quarantined from the training corpus: two distinct
# photographic scenes (architecture, webcam indoor scene) reserved for the
# generalization probe. camera_rgb's reprocessed siblings (camera_*.jpg,
# same scene) were never corpus candidates, so the scene is fully held out.
HOLDOUT = [
    "sklearn/datasets/images/china.jpg",
    "pygame/docs/generated/_images/camera_rgb.jpg",
]


def harvest(out_dir: str, min_dim: int = 96, min_grad: float = 0.01,
            holdout_dir: str = "data/holdout_photos") -> int:
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(holdout_dir, exist_ok=True)
    paths = sorted(set(sum(
        (glob.glob(os.path.join(SITE, g), recursive=True)
         for g in CANDIDATE_GLOBS), [])))
    holdout = {os.path.join(SITE, h) for h in HOLDOUT}
    kept = 0
    for p in paths:
        try:
            im = Image.open(p).convert("L")
        except Exception:
            continue
        if min(im.size) < min_dim:
            continue
        a = np.asarray(im, np.float32) / 255.0
        grad = (np.abs(np.diff(a, axis=1)).mean()
                + np.abs(np.diff(a, axis=0)).mean())
        if grad < min_grad:  # skybox/flat-icon rejection
            continue
        rel = os.path.relpath(p, SITE).replace(os.sep, "_")
        name = os.path.splitext(rel)[0] + ".png"
        if p in holdout:
            im.save(os.path.join(holdout_dir, name))
            continue
        im.save(os.path.join(out_dir, name))
        kept += 1
    return kept


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="data/textures")
    ap.add_argument("--holdout-dir", default="data/holdout_photos")
    ap.add_argument("--min-dim", type=int, default=96)
    ap.add_argument("--min-grad", type=float, default=0.01)
    args = ap.parse_args(argv)
    n = harvest(args.out, args.min_dim, args.min_grad, args.holdout_dir)
    print(f"wrote {n} grayscale textures to {args.out} "
          f"(holdout photos -> {args.holdout_dir})")
    return 0 if n else 1


if __name__ == "__main__":
    sys.exit(main())
