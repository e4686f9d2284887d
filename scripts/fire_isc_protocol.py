"""Standing synthetic FIRE + ISC-HE gates (round-4 counterpart of
scripts/hpatches_protocol.py for the other two reference benchmarks).

Real FIRE/ISC-HE data cannot reach this machine (zero egress), so — like
the 540-pair HPatches gate — this builds corpora in the OFFICIAL on-disk
layouts from synthesized images with exact known homographies and runs
the unmodified `cli eval fire` / `cli eval isc` drivers end-to-end
(resolution buckets, control-point files, per-class AUC aggregation).
The drivers themselves are parity-tested against the reference's own
code (tests/test_eval_driver.py); this gate pins their end-to-end output
on a reproducible corpus each round.

FIRE  (reference protocol: /root/reference/eval_FIRE.py:11-120): fundus-
style images (bright disc on black, vessel random walks, optic blob),
classes S/P/A by warp magnitude mirroring the real split ratio, 10
control points per pair in ground_truth/control_points_<PAIR>_1_2.txt.
ISC-HE (reference protocol: /root/reference/eval_ISC.py:13-135):
industrial textures, query/refer pairs with NORMALIZED control points in
gd/<name>_2-<name>_1.txt.

    python scripts/fire_isc_protocol.py [--ckpt ...] [--bf16 --pallas]
    python scripts/fire_isc_protocol.py --build-only   # corpora only
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np


# ---------------------------------------------------------------- FIRE corpus
def _fundus(rng, size: int) -> np.ndarray:
    """Grayscale fundus-like image in [0,1]: bright circular retina on a
    black surround, dark vessel walks, a brighter optic-disc blob, plus
    low-amplitude texture so the matcher has local structure."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    c = size / 2.0
    r = np.hypot(yy - c, xx - c)
    disc = (r < 0.46 * size).astype(np.float32)
    base = disc * (0.55 + 0.25 * np.exp(-(r / (0.33 * size)) ** 2))

    # vessels: biased random walks from the optic disc outward
    ox, oy = c + 0.22 * size * rng.choice([-1, 1]), c + rng.uniform(-.1, .1) * size
    vess = np.zeros((size, size), np.float32)
    for _ in range(10):
        x, y = ox, oy
        ang = rng.uniform(0, 2 * np.pi)
        wline = rng.uniform(1.5, 3.5)
        for _ in range(int(0.9 * size)):
            ang += rng.normal(0, 0.18)
            x += np.cos(ang)
            y += np.sin(ang)
            xi, yi = int(x), int(y)
            if not (0 <= xi < size and 0 <= yi < size):
                break
            w = int(np.ceil(wline))
            vess[max(0, yi - w):yi + w, max(0, xi - w):xi + w] = 1.0
    import cv2

    vess = cv2.GaussianBlur(vess, (0, 0), 1.2)
    base = base * (1.0 - 0.45 * vess)
    # optic disc highlight
    od = np.exp(-((yy - oy) ** 2 + (xx - ox) ** 2) / (0.04 * size) ** 2)
    base = base + 0.3 * od * disc
    # mild texture (speckle + low-frequency mottle)
    base += disc * 0.06 * rng.standard_normal((size, size)).astype(np.float32)
    mot = cv2.GaussianBlur(
        rng.standard_normal((size, size)).astype(np.float32), (0, 0), size / 24)
    base += disc * 0.5 * mot
    return np.clip(base, 0, 1)


def _warp_mat(rng, size: int, mag: float) -> np.ndarray:
    """Perspective warp (frame -> frame) by corner jitter of magnitude
    mag (fraction of the image side), same construction as the HPatches
    corpus builder."""
    import cv2

    src = np.array([[0, 0], [size, 0], [size, size], [0, size]], np.float32)
    jit = rng.uniform(-mag, mag, (4, 2)).astype(np.float32) * size
    return cv2.getPerspectiveTransform(src, src + jit)


def _proj(H, pts):
    ph = np.concatenate([pts, np.ones((len(pts), 1))], 1) @ H.T
    return ph[:, :2] / ph[:, 2:]


def _control_points(rng, W, size, n=10, margin=0.18):
    """n points inside the retina disc of image 1 whose warps stay inside
    image 2."""
    pts1 = []
    while len(pts1) < n:
        p = rng.uniform(margin * size, (1 - margin) * size, (1, 2))
        q = _proj(W, p)
        if (q > 0.02 * size).all() and (q < 0.98 * size).all():
            pts1.append((p[0], q[0]))
    return (np.array([a for a, _ in pts1]), np.array([b for _, b in pts1]))


def build_fire(out_dir: str, seed: int = 0, size: int = 1024,
               n_s: int = 25, n_p: int = 17, n_a: int = 7) -> int:
    """FIRE layout: images/<PAIR>_{1,2}.jpg +
    ground_truth/control_points_<PAIR>_1_2.txt ([10,4] x1 y1 x2 y2)."""
    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "ground_truth"), exist_ok=True)
    mags = {"S": 0.025, "P": 0.07, "A": 0.11}
    counts = {"S": n_s, "P": n_p, "A": n_a}
    n = 0
    for cls, cnt in counts.items():
        for k in range(1, cnt + 1):
            pair = f"{cls}{k:02d}"
            im1 = _fundus(rng, size)
            W = _warp_mat(rng, size, mags[cls])          # frame 1 -> frame 2
            im2 = cv2.warpPerspective(im1, W, (size, size))
            if cls == "A":                                # anatomy-ish change
                im2 = np.clip(im2 * rng.uniform(0.8, 1.15) +
                              rng.uniform(-0.06, 0.06), 0, 1)
            p1, p2 = _control_points(rng, W, size)
            # eval warps image-2 points by H(2->1) and compares to image-1
            # points: columns are x1 y1 x2 y2 (eval/fire.py:62-84)
            np.savetxt(os.path.join(out_dir, "ground_truth",
                                    f"control_points_{pair}_1_2.txt"),
                       np.concatenate([p1, p2], axis=1))
            for idx, im in ((1, im1), (2, im2)):
                cv2.imwrite(os.path.join(out_dir, "images",
                                         f"{pair}_{idx}.jpg"),
                            (im * 255).astype(np.uint8),
                            [cv2.IMWRITE_JPEG_QUALITY, 95])
            n += 1
    return n


# -------------------------------------------------------------- ISC-HE corpus
def build_isc(out_dir: str, seed: int = 0, n_pairs: int = 40) -> int:
    """ISC layout: query/<name>_2.jpg, refer/<name>_1.jpg,
    gd/<name>_2-<name>_1.txt with NORMALIZED x1 y1 (query) x2 y2 (refer).
    NOTE eval/isc.py matches query->refer: refer is the warped view."""
    import cv2

    from geoformer_tpu.data.synthetic import procedural_texture

    rng = np.random.default_rng(seed)
    for sub in ("query", "refer", "gd"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    n = 0
    for k in range(n_pairs):
        name = f"isc{k:03d}"
        h1, w1 = int(rng.choice([480, 600, 720])), int(rng.choice([640, 800]))
        q = procedural_texture(rng, (h1, w1))
        # moderate industrial-style warp + photometric shift
        import cv2 as _cv

        src = np.array([[0, 0], [w1, 0], [w1, h1], [0, h1]], np.float32)
        jit = (rng.uniform(-0.12, 0.12, (4, 2)) *
               np.array([[w1, h1]], np.float32)).astype(np.float32)
        h2, w2 = h1, w1
        W = _cv.getPerspectiveTransform(src, src + jit)    # query -> refer
        r = _cv.warpPerspective(q, W, (w2, h2))
        r = np.clip(r * rng.uniform(0.75, 1.2) + rng.uniform(-0.08, 0.08),
                    0, 1)
        # 10 control points inside both frames, normalized per-frame
        pts = []
        while len(pts) < 10:
            p = rng.uniform([0.1 * w1, 0.1 * h1], [0.9 * w1, 0.9 * h1], (1, 2))
            d = _proj(W, p)
            if (d > [0.02 * w2, 0.02 * h2]).all() and \
                    (d < [0.98 * w2, 0.98 * h2]).all():
                pts.append((p[0] / [w1, h1], d[0] / [w2, h2]))
        gd = np.array([np.concatenate([a, b]) for a, b in pts])
        np.savetxt(os.path.join(out_dir, "gd", f"{name}_2-{name}_1.txt"), gd)
        cv2.imwrite(os.path.join(out_dir, "query", f"{name}_2.jpg"),
                    (q * 255).astype(np.uint8))
        cv2.imwrite(os.path.join(out_dir, "refer", f"{name}_1.jpg"),
                    (r * 255).astype(np.uint8))
        n += 1
    return n


def build_isc_cls(isc_dir: str, out_txt: str, seed: int = 0) -> int:
    """Same-scene classification list from the ISC corpus: each (query,
    refer) pair is a positive; negatives pair query k with refer of a
    DIFFERENT scene (reference my_helper.py:225-324 eval_cls_my consumes
    `query refer label` lines)."""
    rng = np.random.default_rng(seed)
    qs = sorted(os.listdir(os.path.join(isc_dir, "query")))
    names = [q[:-len("_2.jpg")] for q in qs]
    lines = []
    for i, n in enumerate(names):
        q = os.path.join(isc_dir, "query", f"{n}_2.jpg")
        lines.append(f"{q} {os.path.join(isc_dir, 'refer', n + '_1.jpg')} 1")
        j = (i + int(rng.integers(1, len(names)))) % len(names)
        lines.append(
            f"{q} {os.path.join(isc_dir, 'refer', names[j] + '_1.jpg')} 0")
    with open(out_txt, "w") as f:
        f.write("\n".join(lines) + "\n")
    return len(lines)


# --------------------------------------------------------------------- runner
def _run_eval(benchmark, corpus, args):
    # Results come back through --json-out (a file), NOT by scraping stdout:
    # `cli eval` pretty-prints nested JSON, which defeats rindex('{') parsing.
    json_out = os.path.join("/tmp", f"eval_{benchmark}_{os.getpid()}.json")
    cmd = [sys.executable, "-m", "geoformer_tpu.cli", "eval", benchmark,
           "--data", corpus, "--ckpt", args.ckpt, "--json-out", json_out]
    for flag in ("bf16", "pallas"):
        if getattr(args, flag):
            cmd.append("--" + flag)
    print("running:", " ".join(cmd), flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True)
    sys.stderr.write((r.stderr or "")[-2000:])
    print(r.stdout[-2000:], flush=True)
    if r.returncode:
        sys.exit(r.returncode)
    with open(json_out) as f:
        out = json.load(f)
    os.remove(json_out)
    out["wall_clock_s"] = round(time.time() - t0, 1)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="checkpoints/tpu_r3_main/params_final.npz")
    ap.add_argument("--fire-dir", default="/tmp/fire_synth")
    ap.add_argument("--isc-dir", default="/tmp/isc_synth")
    ap.add_argument("--seed", type=int, default=20260820)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--build-only", action="store_true")
    ap.add_argument("--skip-fire", action="store_true")
    ap.add_argument("--skip-isc", action="store_true")
    args = ap.parse_args()

    if not os.path.isdir(os.path.join(args.fire_dir, "images")):
        n = build_fire(args.fire_dir, seed=args.seed)
        print(f"built FIRE corpus: {n} pairs at {args.fire_dir}", flush=True)
    if not os.path.isdir(os.path.join(args.isc_dir, "query")):
        n = build_isc(args.isc_dir, seed=args.seed + 1)
        print(f"built ISC corpus: {n} pairs at {args.isc_dir}", flush=True)
    if args.build_only:
        return

    rec = {"protocol": "fire_isc_synth", "seed": args.seed,
           "config": {"bf16": args.bf16, "pallas": args.pallas}}
    if not args.skip_fire:
        rec["fire"] = _run_eval("fire", args.fire_dir, args)
    if not args.skip_isc:
        rec["isc"] = _run_eval("isc", args.isc_dir, args)
        cls_txt = os.path.join(args.isc_dir, "cls_pairs.txt")
        if not os.path.exists(cls_txt):
            build_isc_cls(args.isc_dir, cls_txt, seed=args.seed + 2)
        rec["isc_cls"] = _run_eval("isc-cls", cls_txt, args)
    # Standing-gate thresholds (first run 2026-08-20: FIRE mAUC 0.9995,
    # ISC AUC@3 0.983 — RESULTS.md round 5). Exit nonzero on regression.
    ok = True
    if "fire" in rec:
        ok &= rec["fire"].get("mAUC", 0.0) >= 0.99
        ok &= rec["fire"].get("failed", 1) == 0
    if "isc" in rec:
        ok &= (rec["isc"].get("auc") or [0])[0] >= 0.97
    if "isc_cls" in rec:
        ok &= rec["isc_cls"].get("eer", 1.0) <= 0.05
    rec["gate_pass"] = bool(ok)
    print(json.dumps(rec))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
