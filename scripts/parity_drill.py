"""Real-data readiness rehearsal for `cli parity` (VERDICT r3 #4).

Fabricates a reference-named torch checkpoint from the committed headline
npz (utils/torch_convert.to_torch_state_dict), then runs the one-command
parity gate against the synthetic HPatches corpus. The moment the released
`geoformer.ckpt` + `hpatches-sequences-release` land on this machine, the
real run is exactly:

    python -m geoformer_tpu.cli parity --ckpt saved_ckpt/geoformer.ckpt \
        --hpatches data/hpatches-sequences-release --pallas --bf16

(defaults gate the AUC block against the reference README's published
numbers, reference: README.md:110-120, within --gate-pt 1.0.)

Rehearsal usage (fabricated ckpt, synthetic corpus, self-measured gate):

    python scripts/parity_drill.py --corpus /tmp/hpatches_synth \
        --expect <auc1,auc3,auc5,auc10> [--max-seqs 8]
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default="checkpoints/tpu_r3_main/params_final.npz")
    ap.add_argument("--corpus", default="/tmp/hpatches_synth")
    ap.add_argument("--ckpt-out", default="/tmp/drill_geoformer.ckpt")
    ap.add_argument("--expect", default=None,
                    help="AUC gate for the rehearsal (default: README block, "
                         "which a synthetic-corpus run is NOT expected to hit "
                         "unless you pass the corpus's own measured numbers)")
    ap.add_argument("--max-seqs", type=int, default=None)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--pallas", action="store_true")
    args = ap.parse_args()

    # 1. fabricate a torch .ckpt the way Lightning saved the released one
    import torch

    from geoformer_tpu.train.checkpoint import load_variables
    from geoformer_tpu.utils.torch_convert import to_torch_state_dict

    variables = load_variables(args.npz)
    sd = {k: torch.from_numpy(v.copy())
          for k, v in to_torch_state_dict(variables).items()}
    torch.save({"state_dict": sd, "epoch": 0}, args.ckpt_out)
    print(f"fabricated torch checkpoint: {args.ckpt_out} "
          f"({len(sd)} tensors)", flush=True)

    # 2. corpus present?
    if not os.path.isdir(args.corpus):
        print(f"building synthetic corpus at {args.corpus} ...", flush=True)
        subprocess.run([sys.executable, "scripts/hpatches_synth.py",
                        "--out", args.corpus], check=True)

    # 3. the one command the real drill will run
    cmd = [sys.executable, "-m", "geoformer_tpu.cli", "parity",
           "--ckpt", args.ckpt_out, "--hpatches", args.corpus]
    if args.expect:
        cmd += ["--expect", args.expect]
    if args.max_seqs:
        cmd += ["--max-seqs", str(args.max_seqs)]
    if args.bf16:
        cmd.append("--bf16")
    if args.pallas:
        cmd.append("--pallas")
    print("running:", " ".join(cmd), flush=True)
    r = subprocess.run(cmd)
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
