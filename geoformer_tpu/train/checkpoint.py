"""Checkpoint save/restore (orbax).

Replaces Lightning's ModelCheckpoint + torch pickle (reference:
train_homo_geoformer.py:107-110, lightning_homo_geoformer.py:84-87) with
orbax pytree checkpoints; resume restores params, batch stats, optimizer
state, and step atomically.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from geoformer_tpu.train.trainer import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int,
                    keep: int = 5) -> None:
    path = os.path.abspath(ckpt_dir)
    os.makedirs(path, exist_ok=True)
    with ocp.CheckpointManager(
            path, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state._asdict()))


def restore_checkpoint(ckpt_dir: str, state: TrainState,
                       step: Optional[int] = None,
                       require: bool = False) -> TrainState:
    """Restore the latest (or given) orbax step.

    With require=True (set by --resume) a missing checkpoint raises instead
    of silently returning the fresh-init state — otherwise a resume whose
    on-disk orbax dir was lost would restart from step 0 and invalidate the
    experiment it claims to continue.
    """
    path = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(path) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            if require:
                raise FileNotFoundError(
                    f"--resume requested but no orbax checkpoint step exists "
                    f"under {path}; refusing to silently restart from step 0")
            return state
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(state._asdict()))
    return TrainState(**restored)


def save_checkpoint_monitored(ckpt_dir: str, state: TrainState, step: int,
                              metrics: dict, monitor: str = "auc@10",
                              mode: str = "max", keep: int = 5) -> None:
    """Top-k checkpoint retention by a monitored metric.

    Mirrors Lightning's ModelCheckpoint(monitor=..., save_top_k=5)
    (reference: lightning/train_depth_geoformer.py:105-108 keeps top-5 by
    auc@10; train_homo_geoformer.py:107-110 by val_loss): orbax keeps the
    best `keep` steps ranked by metrics[monitor].
    """
    path = os.path.abspath(ckpt_dir)
    os.makedirs(path, exist_ok=True)
    with ocp.CheckpointManager(
            path,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                best_fn=lambda m: float(m[monitor]),
                best_mode=mode,
            )) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state._asdict()),
                 metrics={monitor: float(metrics[monitor])})


def _flatten_tree(d: Any, prefix: str = "") -> dict:
    import numpy as np

    out = {}
    for k, v in dict(d).items():
        kk = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict) or hasattr(v, "items"):
            out.update(_flatten_tree(v, kk))
        else:
            out[kk] = np.asarray(v)
    return out


def save_params(path: str, params: Any) -> None:
    """Standalone param export (eval-ready, no optimizer state).

    ``.npz`` paths write a data-only archive (flattened pytree, '/'-joined
    keys; loads with allow_pickle=False) — the committed-artifact format,
    since pickle executes arbitrary code on load. Other extensions keep the
    legacy pickle for back-compat with earlier round artifacts.
    """
    params = jax.tree.map(lambda x: jax.device_get(x), params)
    if path.endswith(".npz"):
        import numpy as np

        np.savez(path, **_flatten_tree(params))
        return
    import pickle

    with open(path, "wb") as f:
        pickle.dump(params, f)


def load_variables(path: str) -> Any:
    """Load an exported checkpoint as apply-ready flax variables.

    Drops metadata entries (e.g. the 'step' stamp save_params adds) and
    wraps bare param trees, so the result can go straight into
    ``model.apply``.
    """
    loaded = load_params(path)
    if "params" not in loaded:
        return {"params": loaded}
    return {k: v for k, v in loaded.items()
            if k in ("params", "batch_stats")}


def load_params(path: str) -> Any:
    if path.endswith(".npz"):
        import numpy as np

        z = np.load(path)  # allow_pickle defaults to False: data-only
        out: dict = {}
        for k in z.files:
            parts = k.split("/")
            cur = out
            for p in parts[:-1]:
                cur = cur.setdefault(p, {})
            cur[parts[-1]] = z[k]
        return out
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)
