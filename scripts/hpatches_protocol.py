"""The standing 540-pair quality gate (VERDICT r3 #2).

Runs `cli eval hpatches` over the mixed-resolution synthetic corpus
(scripts/hpatches_synth.py, 108 sequences x 5 pairs — the real benchmark's
layout and size census) and records AUC@1/3/5/10, est_failed, and
end-to-end wall-clock with and without prewarm. This replaces the noisy
40-pair selfcheck as the number recipe changes are ranked against
(~±1 pt @1px at 540 pairs vs ±3 pt at 40).

    python scripts/hpatches_protocol.py [--ckpt ...] [--bf16 --pallas]
    # protocol mirror: /root/reference/eval_Hpatches.py:12-114
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/tpu_r3_main/params_final.npz")
    ap.add_argument("--corpus", default="/tmp/hpatches_synth")
    ap.add_argument("--max-seqs", type=int, default=None)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--int8-full", action="store_true")
    ap.add_argument("--max-matches", type=int, default=None,
                    help="capacity A/B (VERDICT r4 next #3); default 1024")
    args = ap.parse_args()

    if not os.path.isdir(args.corpus):
        print(f"building corpus at {args.corpus} ...", flush=True)
        subprocess.run([sys.executable, "scripts/hpatches_synth.py",
                        "--out", args.corpus], check=True)

    json_out = f"/tmp/hp540_{os.getpid()}.json"
    cmd = [sys.executable, "-m", "geoformer_tpu.cli", "eval", "hpatches",
           "--data", args.corpus, "--ckpt", args.ckpt,
           "--json-out", json_out]
    if args.max_seqs:
        cmd += ["--max-seqs", str(args.max_seqs)]
    if args.max_matches:
        cmd += ["--max-matches", str(args.max_matches)]
    for flag in ("bf16", "pallas", "int8", "int8_full"):
        if getattr(args, flag):
            cmd.append("--" + flag.replace("_", "-"))
    print("running:", " ".join(cmd), flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True)
    wall = time.time() - t0
    sys.stderr.write((r.stderr or "")[-3000:])
    print(r.stdout[-2500:], flush=True)
    if r.returncode:
        sys.exit(r.returncode)
    with open(json_out) as f:
        out = json.load(f)
    os.remove(json_out)
    rec = {
        "protocol": "hpatches_synth_540",
        "config": {"bf16": args.bf16, "pallas": args.pallas,
                   "int8": args.int8, "int8_full": args.int8_full,
                   "max_matches": args.max_matches or 1024},
        "n_pairs": out.get("n_pairs"),
        "est_failed": out.get("est_failed"),
        "mean_matches": out.get("mean_matches"),
        "auc_a": out.get("auc_a"),
        "auc_i": out.get("auc_i"),
        "auc_v": out.get("auc_v"),
        "mma_i@3": (out.get("mma_i") or {}).get("3"),
        "mma_v@3": (out.get("mma_v") or {}).get("3"),
        "match_time_s": out.get("match_time"),
        "wall_clock_s": round(wall, 1),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
