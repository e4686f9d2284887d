"""Multi-host smoke test on localhost: 2 processes x 4 CPU devices.

Validates the multi-host code paths without pod hardware: jax.distributed
initialization, a global mesh spanning both processes, one sharded train step
(GSPMD gradient psum across processes), and host-side metric aggregation via
core/dist.all_gather_metrics.

Usage (self-launching):
    python scripts/multihost_smoke.py
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PROC = 2
DEV_PER_PROC = 4


def worker(pid: int):
    import jax

    # NOTE: on this machine only the config-update route works (the ambient
    # axon platform interferes with the env-var route)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", DEV_PER_PROC)
    # CPU cross-process collectives need an explicit implementation
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address="127.0.0.1:19876",
                               num_processes=N_PROC, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from geoformer_tpu.config import (
        GeoFormerConfig,
        GeoModuleConfig,
        MatchConfig,
        TrainConfig,
    )
    from geoformer_tpu.core.dist import all_gather_metrics, host_mean
    from geoformer_tpu.core.mesh import local_shard_slice
    from geoformer_tpu.data.synthetic import make_pair_batch
    from geoformer_tpu.models import GeoFormer
    from geoformer_tpu.train.trainer import init_state, make_train_step

    assert jax.process_count() == N_PROC
    n_global = len(jax.devices())
    assert n_global == N_PROC * DEV_PER_PROC, n_global

    mesh = Mesh(np.array(jax.devices()), ("data",))
    hw = (64, 80)
    cfg = GeoFormerConfig(
        match=MatchConfig(max_matches=16, force_one_match=True),
        geo=GeoModuleConfig(ransac_iters=16, max_inliers=16),
    )
    tcfg = TrainConfig(batch_size=n_global, image_hw=hw, steps_per_epoch=10)
    model = GeoFormer(cfg)
    state, opt = init_state(model, tcfg, jax.random.key(0))
    step = make_train_step(model, opt, tcfg)

    # per-host shard of the global batch, assembled into a global array
    sl = local_shard_slice(n_global)
    rng = np.random.default_rng(0)
    base_global = rng.random((n_global, *hw)).astype(np.float32)
    local = jnp.asarray(base_global[sl])
    from jax.experimental import multihost_utils

    base = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("data"))
    batch = make_pair_batch(base, jax.random.key(1))

    repl = NamedSharding(mesh, P())
    jstep = jax.jit(step, in_shardings=(repl, NamedSharding(mesh, P("data")),
                                        repl, repl),
                    out_shardings=(repl, repl))
    state2, metrics = jstep(state, batch, jax.random.key(2),
                            jnp.asarray(1e-4))
    loss = host_mean(metrics["loss"])
    gathered = all_gather_metrics({"loss": np.asarray([loss])})
    if pid == 0:
        print(f"[multihost] procs={jax.process_count()} devices={n_global} "
              f"loss={loss:.4f} gathered={gathered['loss'].shape}", flush=True)
        assert np.isfinite(loss)
        assert gathered["loss"].shape[0] == N_PROC

    # --- depth validation: per-host val batches (DDP-style), pose errors
    # recovered on each host, aggregated across processes by the same
    # all_gather path the depth training loop uses
    from geoformer_tpu.train.depth_loop import run_depth_validation
    from geoformer_tpu.train.trainer import make_depth_val_step

    b_local = DEV_PER_PROC
    K = np.tile(np.array([[100.0, 0, 40], [0, 100, 32], [0, 0, 1]],
                         np.float32), (b_local, 1, 1))
    T = np.tile(np.eye(4, dtype=np.float32), (b_local, 1, 1))
    T[:, 0, 3] = 0.5
    rng_v = np.random.default_rng(100 + pid)
    dbatch = {
        "image0": jnp.asarray(rng_v.random((b_local, *hw, 1), np.float32)),
        "image1": jnp.asarray(rng_v.random((b_local, *hw, 1), np.float32)),
        "depth0": jnp.full((b_local, *hw), 5.0),
        "depth1": jnp.full((b_local, *hw), 5.0),
        "T_0to1": jnp.asarray(T), "T_1to0": jnp.asarray(np.linalg.inv(T)),
        "K0": jnp.asarray(K), "K1": jnp.asarray(K),
        "scale0": jnp.ones((b_local, 2)), "scale1": jnp.ones((b_local, 2)),
    }
    val_fn = jax.jit(make_depth_val_step(model, tcfg))
    agg = run_depth_validation(val_fn, state2, [dbatch], jax.random.key(9))
    if pid == 0:
        assert all(np.isfinite(agg[k]) for k in
                   ("auc@5", "auc@10", "auc@20")), agg
        print(f"[multihost] depth-val agg over "
              f"{N_PROC} procs: auc@10={agg['auc@10']:.4f}", flush=True)
        print("[multihost] OK", flush=True)


def main():
    if "MH_PID" in os.environ:
        worker(int(os.environ["MH_PID"]))
        return
    procs = []
    for pid in range(N_PROC):
        env = dict(os.environ, MH_PID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=None if pid == 0 else subprocess.DEVNULL,
            stderr=subprocess.STDOUT if pid == 0 else subprocess.DEVNULL))
    rcs = [p.wait(timeout=1200) for p in procs]
    assert all(rc == 0 for rc in rcs), rcs


if __name__ == "__main__":
    main()
