"""Per-round ATE protocol for the SLAM engine (VERDICT r3 #5).

A SEEDED synthetic planar sequence (deterministic from --seed: textured
plane + SL(3) random-walk camera sweep) is written as PNG frames + GT
trajectory, then `cli slam` runs the full stack (matcher -> on-device
RANSAC odometry + loop closures -> SL(3) pose-graph optimization) and the
optimized corner drift is gated against a pinned regression threshold.
Record the JSON line in RESULTS.md each round, like the bench.

    python scripts/ate_protocol.py [--ckpt ...] [--frames 12]

North-star anchor: "trajectories within the ATE bound on benchmark
sequences" (BASELINE.json engine row) on the only sequences available on
this machine (zero egress).
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np

# Pinned gate: round-1 measured 1.43 px optimized drift on 8 frames; the
# 12-frame protocol is harder, so the gate leaves headroom over the first
# recorded protocol number without letting a silent 2x regression pass.
REGRESSION_GATE_PX = 3.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/tpu_r3_main/params_final.npz")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--seed", type=int, default=20260819)
    ap.add_argument("--loop-stride", type=int, default=5)
    ap.add_argument("--dir", default="/tmp/ate_protocol_seq")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--pallas", action="store_true")
    args = ap.parse_args()

    from geoformer_tpu.core.platform import respect_platform_env

    respect_platform_env()

    import cv2
    import jax.numpy as jnp

    from geoformer_tpu.data.native import native_textures, native_warp
    from geoformer_tpu.engine.homography_graph import sl3_exp

    H, W, K = args.height, args.width, args.frames
    rng = np.random.default_rng(args.seed)
    base = native_textures(1, H, W, args.seed)[0]
    Hs_gt = [np.eye(3, dtype=np.float32)]
    for _ in range(1, K):
        xi = rng.normal(0, 0.015, 8).astype(np.float32)
        xi[4] = rng.normal(0, 12.0)
        xi[5] = rng.normal(0, 12.0)
        xi[6:] *= 1e-4
        Hs_gt.append(np.asarray(sl3_exp(jnp.asarray(xi))) @ Hs_gt[-1])
    Hs_gt = np.stack(Hs_gt)
    frames = np.asarray(native_warp(np.repeat(base[None], K, 0), Hs_gt))

    os.makedirs(args.dir, exist_ok=True)
    for k in range(K):
        cv2.imwrite(os.path.join(args.dir, f"frame_{k:03d}.png"),
                    (np.clip(frames[k], 0, 1) * 255).astype(np.uint8))
    gt_path = os.path.join(args.dir, "gt.npz")
    np.savez(gt_path, H=Hs_gt)

    cmd = [sys.executable, "-m", "geoformer_tpu.cli", "slam",
           "--images", args.dir, "--glob", "frame_*.png",
           "--loop-stride", str(args.loop_stride), "--gt", gt_path,
           "--ckpt", args.ckpt, "--imsize", str(max(H, W))]
    if args.bf16:
        cmd.append("--bf16")
    if args.pallas:
        cmd.append("--pallas")
    print("running:", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, capture_output=True, text=True)
    sys.stderr.write(r.stderr[-2000:] if r.stderr else "")
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    if r.returncode or not lines:
        print(r.stdout[-2000:])
        sys.exit(r.returncode or 1)
    slam = json.loads(lines[-1])

    rec = {
        "protocol": "ate_synthetic_planar",
        "seed": args.seed,
        "frames": K,
        "loop_stride": args.loop_stride,
        "corner_drift_chained_px": slam.get("corner_drift_chained_px"),
        "corner_drift_optimized_px": slam.get("corner_drift_optimized_px"),
        "gate_px": REGRESSION_GATE_PX,
        "pass": (slam.get("corner_drift_optimized_px") is not None
                 and slam["corner_drift_optimized_px"] <= REGRESSION_GATE_PX),
    }
    print(json.dumps(rec))
    sys.exit(0 if rec["pass"] else 1)


if __name__ == "__main__":
    main()
