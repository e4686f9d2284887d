"""Build a synthetic HPatches-shaped corpus (layout + size census).

Writes an `hpatches-sequences-release`-layout tree — 108 sequences
(52 i_ illumination / 56 v_ viewpoint, the real benchmark's split),
each with 1.ppm..6.ppm and H_1_2..H_1_6 ground-truth homographies —
from textures synthesized on this machine. Sizes are drawn from a
mixed-resolution census (min edge 480..960, landscape-heavy aspect mix,
some within-sequence size changes on v_ sequences) to exercise the
eval pipeline's resolution buckets the way the real benchmark does.

Two uses:
  1. Compile-budget rehearsal (VERDICT r2 next #8): time prewarm + total
     wall-clock of `cli eval hpatches --data <out>` before burning tunnel
     time on the real corpus.
  2. Full-protocol quality stand-in: 540 pairs at mixed resolutions under
     known GT, vs selfcheck_eval.py's 40 same-shape pairs.

    python scripts/hpatches_synth.py --out /tmp/hpatches_synth
    python -m geoformer_tpu.cli eval hpatches --data /tmp/hpatches_synth \
        --ckpt checkpoints/.../params_final.npz
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


# (min_edge, aspect) census: landscape-heavy with some portrait, mirroring
# the real benchmark's diversity after min-edge-480 resize. Aspect = w/h.
MIN_EDGES = [480, 560, 640, 720, 800, 880, 960]
ASPECTS = [4 / 3, 3 / 2, 16 / 9, 1.25, 3 / 4, 2 / 3]
ASPECT_W = [0.3, 0.25, 0.15, 0.1, 0.12, 0.08]


def _size(rng) -> tuple:
    me = int(rng.choice(MIN_EDGES))
    asp = float(rng.choice(ASPECTS, p=ASPECT_W))
    if asp >= 1:
        h, w = me, int(round(me * asp / 8) * 8)
    else:
        w, h = me, int(round(me / asp / 8) * 8)
    return h, w


def _texture(rng, hw, image_bank):
    if image_bank and rng.random() < 0.4:
        import cv2

        im = image_bank[int(rng.integers(len(image_bank)))]
        return cv2.resize(im, (hw[1], hw[0])).astype(np.float32) / 255.0
    from geoformer_tpu.data.synthetic import procedural_texture

    return procedural_texture(rng, hw)


def _photometric(rng, im):
    g = float(rng.uniform(0.6, 1.6))
    im = np.clip(im, 0, 1) ** g
    im = im * float(rng.uniform(0.7, 1.2)) + float(rng.uniform(-0.1, 0.1))
    if rng.random() < 0.5:
        im = im + rng.normal(0, 0.02, im.shape)
    return np.clip(im, 0, 1)


def _corner_h(rng, hw0, hw1, mag=0.22):
    """Random perspective H mapping frame (h0,w0) -> (h1,w1) via perturbed
    corners (the standard 4-corner construction; cv2 only in this data
    generator, never in the compute path)."""
    import cv2

    h0, w0 = hw0
    h1, w1 = hw1
    src = np.array([[0, 0], [w0, 0], [w0, h0], [0, h0]], np.float32)
    dst = np.array([[0, 0], [w1, 0], [w1, h1], [0, h1]], np.float32)
    jitter = (rng.uniform(-mag, mag, (4, 2))
              * np.array([[w1, h1]], np.float32)).astype(np.float32)
    return cv2.getPerspectiveTransform(src, dst + jitter)


def _ppm8(im) -> np.ndarray:
    """Gray [0,1] float -> 3-channel uint8: OpenCV 5 refuses grayscale .ppm
    writes (grfmt_pxm 'expects BGR image'), which silently produced
    imageless sequences until round 4."""
    g = (np.clip(im, 0, 1) * 255).astype(np.uint8)
    return np.repeat(g[..., None], 3, axis=-1)


def build(out_dir: str, n_i: int = 52, n_v: int = 56, seed: int = 0,
          use_images: bool = True) -> int:
    import cv2

    rng = np.random.default_rng(seed)
    bank = []
    if use_images and os.path.isdir("data/textures"):
        for f in sorted(os.listdir("data/textures")):
            im = cv2.imread(os.path.join("data/textures", f),
                            cv2.IMREAD_GRAYSCALE)
            if im is not None:
                bank.append(im)
    names = [f"i_synth{k:03d}" for k in range(n_i)] + \
        [f"v_synth{k:03d}" for k in range(n_v)]
    for name in names:
        seq = os.path.join(out_dir, name)
        os.makedirs(seq, exist_ok=True)
        hw0 = _size(rng)
        base = _texture(rng, hw0, bank)
        cv2.imwrite(os.path.join(seq, "1.ppm"),
                    _ppm8(base))
        for idx in range(2, 7):
            if name.startswith("i_"):
                # Small non-identity warp (~1.5% corner jitter): the real
                # i-split is fixed-camera, but exact-identity GT saturates
                # AUC@1px by construction (round-4 gate: i-split 0.9988 —
                # estimator noise, no signal). A slight warp keeps the
                # split illumination-DOMINATED while making its corner
                # error measure estimation (VERDICT r4 weak #2 / next #7).
                hwk = hw0
                H = _corner_h(rng, hw0, hwk, mag=0.015)
                im = cv2.warpPerspective(base, H, (hwk[1], hwk[0]))
                im = _photometric(rng, im)
            else:
                # some v_ sequences change size between images, like the
                # real corpus — stresses the per-sequence max-bucket census
                hwk = _size(rng) if rng.random() < 0.3 else hw0
                H = _corner_h(rng, hw0, hwk)
                im = cv2.warpPerspective(base, H, (hwk[1], hwk[0]))
                im = _photometric(rng, im)
            cv2.imwrite(os.path.join(seq, f"{idx}.ppm"),
                        _ppm8(im))
            np.savetxt(os.path.join(seq, f"H_1_{idx}"), H)
    return len(names)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/hpatches_synth")
    ap.add_argument("--n-i", type=int, default=52)
    ap.add_argument("--n-v", type=int, default=56)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-images", action="store_true",
                    help="procedural textures only (no data/textures bank)")
    args = ap.parse_args(argv)
    n = build(args.out, args.n_i, args.n_v, args.seed,
              use_images=not args.no_images)
    print(f"wrote {n} sequences to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
