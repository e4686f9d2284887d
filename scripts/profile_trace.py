"""Device-trace attribution of the bench forward (VERDICT r4 next #2).

Takes a `jax.profiler` trace of the exact bench.py forward (B=8 480x640
bf16+pallas by default), then post-processes the xplane protobuf with the
installed tensorboard-plugin-profile converters into a per-op table:

  - total device busy time per timed step vs wall-clock per step
    (the measured non-FLOP floor: dispatch gaps, transfers, bubbles)
  - top-k ops by self time, grouped by category (conv, fusion, custom-call
    = pallas kernels, all-to-all/copy = relayouts, ...)

    python scripts/profile_trace.py [--f32] [--iters 4] [--logdir /tmp/tr]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import glob
import json
import time


def build_fwd(args):
    import jax
    import numpy as np

    from geoformer_tpu.config import (
        FineTransformerConfig,
        GeoFormerConfig,
        GeoModuleConfig,
        MatchConfig,
    )
    from geoformer_tpu.models import GeoFormer

    B, H, W = args.batch, 480, 640
    cfg = GeoFormerConfig(
        fine=FineTransformerConfig(attention="linear_flat"),
        match=MatchConfig(max_matches=args.max_matches),
        geo=GeoModuleConfig(ransac_iters=256, max_inliers=args.max_matches,
                            use_pallas=True),
        use_bf16=not args.f32,
    )
    model = GeoFormer(cfg)
    key = jax.random.key(0)
    rng = np.random.default_rng(0)
    bank = jax.numpy.asarray(
        rng.random((args.iters + 1, B, H, W, 1), np.float32))
    params = model.init({"params": key, "ransac": key},
                        bank[0][:1], bank[0][:1])

    @jax.jit
    def fwd(params, i0, i1):
        return model.apply(params, i0, i1,
                           rngs={"ransac": jax.random.key(0)})

    return fwd, params, bank


def parse_xplane(logdir):
    """Aggregate device-op self-times from the trace's xplane file.

    Uses the installed `xprof` converters (the tensorboard-plugin-profile
    2.13 protos are incompatible with this protobuf runtime)."""
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return None, "no xplane.pb produced"
    path = max(paths, key=os.path.getmtime)
    try:
        from xprof.convert import raw_to_tool_data
    except ImportError as e:
        return None, f"xprof unavailable: {e}"
    try:
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [path], "framework_op_stats^", {})
    except Exception as e:
        return None, f"op_stats conversion failed: {e}"
    return data, path


def digest(data, iters):
    """Summarize the gviz framework_op_stats table: totals and top ops."""
    tables = json.loads(data if isinstance(data, str) else data.decode())
    if not tables:
        return None
    cols = [c["id"] for c in tables[0]["cols"]]
    rows = [dict(zip(cols, [c["v"] if isinstance(c, dict) else c
                            for c in r["c"]]))
            for r in tables[0]["rows"]]
    dev = [r for r in rows if str(r.get("host_or_device", "")).lower()
           not in ("host",)]
    idle_us = sum(float(r.get("total_self_time", 0) or 0) for r in dev
                  if r.get("type") == "IDLE")
    dev = [r for r in dev if r.get("type") != "IDLE"]
    total_us = sum(float(r.get("total_self_time", 0) or 0) for r in dev)
    by_cat = {}
    for r in dev:
        c = r.get("type", "?")
        by_cat[c] = by_cat.get(c, 0.0) + float(
            r.get("total_self_time", 0) or 0)
    top = sorted(dev, key=lambda r: -float(r.get("total_self_time", 0) or 0))
    return {
        "device_busy_ms_per_iter": round(total_us / 1e3 / iters, 2),
        "device_idle_ms_per_iter": round(idle_us / 1e3 / iters, 2),
        "by_category_ms_per_iter": {
            k: round(v / 1e3 / iters, 2)
            for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])},
        "top_ops": [
            {"op": r.get("operation"), "type": r.get("type"),
             "ms_per_iter": round(
                 float(r.get("total_self_time", 0) or 0) / 1e3 / iters, 3),
             "occurrences": r.get("occurrences")}
            for r in top[:25]],
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-matches", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--logdir", default="/tmp/geoformer_trace")
    args = ap.parse_args()

    from geoformer_tpu.core.cache import enable_compile_cache
    from geoformer_tpu.core.platform import respect_platform_env

    respect_platform_env()
    enable_compile_cache()
    import jax

    fwd, params, bank = build_fwd(args)

    # compile + settle
    out = fwd(params, bank[0], bank[1])
    float(out.fine.mconf.sum())
    t0 = time.perf_counter()
    out = fwd(params, bank[1], bank[2])
    float(out.fine.mconf.sum())
    per_call = time.perf_counter() - t0
    print(f"# warm per-call: {per_call * 1e3:.1f} ms", flush=True)

    os.makedirs(args.logdir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(args.logdir):
        for i in range(args.iters):
            out = fwd(params, bank[i], bank[i + 1])
            float(out.fine.mconf.sum())
    wall = (time.perf_counter() - t0) / args.iters
    print(f"# traced {args.iters} iters, wall {wall * 1e3:.1f} ms/iter",
          flush=True)

    data, info = parse_xplane(args.logdir)
    if data is None:
        print(f"# xplane parse unavailable ({info}); raw logdir kept at "
              f"{args.logdir}", flush=True)
        return
    print(f"# parsed {info}", flush=True)
    out_path = os.path.join(args.logdir, "op_stats.json")
    if isinstance(data, (bytes, str)):
        with open(out_path, "w") as f:
            f.write(data if isinstance(data, str) else data.decode())
    rec = {"logdir": args.logdir,
           "wall_ms_per_iter": round(wall * 1e3, 1),
           "warm_ms": round(per_call * 1e3, 1)}
    try:
        d = digest(data, args.iters)
        if d:
            rec.update(d)
    except Exception as e:
        rec["digest_error"] = repr(e)[:200]
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
