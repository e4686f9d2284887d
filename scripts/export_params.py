"""Export eval-ready params from an orbax training checkpoint.

Usage: python scripts/export_params.py <ckpt_dir> [out.pkl]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ckpt_dir = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        ckpt_dir, "params_export.pkl")

    import jax

    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mgr:
        step = mgr.latest_step()
        restored = mgr.restore(step)
    from geoformer_tpu.train.checkpoint import save_params

    save_params(out, {"params": restored["params"],
                      "batch_stats": restored["batch_stats"]})
    print(f"exported step {step} -> {out}")


if __name__ == "__main__":
    main()
