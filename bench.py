"""Benchmark: matched image pairs per second per chip on the full GeoFormer
forward (480x640, batch 4), on whatever accelerator jax exposes.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference publishes no speed numbers (SURVEY.md §6); the
eval-harness wall-clock `match_time` for the reference on a CUDA GPU is ~0.2 s
per 480px pair (5 pairs/s) per community reports, so we report the ratio to a
5 pairs/s/device reference point.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    # TPU-native defaults: bf16 compute + the Pallas GAM kernel (quality
    # parity with f32 shown in RESULTS.md); --f32 for the reference dtype.
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--batch", type=int, default=8,
                    help="pairs per forward (measured on v5e: B=8 gives "
                         "30.2 pairs/s vs 26.1 at B=4 by amortizing fixed "
                         "costs; fits eval HBM comfortably)")
    ap.add_argument("--no-mka", action="store_true",
                    help="disable the masked-KV self-attention kernel only "
                         "(isolates it from the box-window cross kernel)")
    ap.add_argument("--int8", action="store_true",
                    help="dynamic int8 backbone convs (v5e int8 MXU peak = "
                         "2x bf16; eval-only, ops/quantize.py)")
    ap.add_argument("--int8-full", action="store_true",
                    help="int8 backbone AND transformer projections/MLPs")
    ap.add_argument("--no-fine-flat", action="store_true",
                    help="per-head linear attention in the fine stack "
                         "(flat layout is the default: +6.7% end-to-end, "
                         "RESULTS.md r4)")
    args = ap.parse_args()
    args.bf16 = not args.f32
    args.pallas = not args.no_pallas

    from geoformer_tpu.core.cache import enable_compile_cache
    from geoformer_tpu.core.platform import respect_platform_env

    respect_platform_env()
    enable_compile_cache()

    # Backend-init watchdog: the tunnel's failure mode is a silent hang in
    # plugin init (observed 2026-08-18: host-side pool down, client blocks
    # forever). Probe device discovery in a side thread so a dead tunnel
    # turns into a bounded, diagnosable failure instead of a stuck driver.
    import os
    import sys
    import threading

    ready = threading.Event()
    threading.Thread(target=lambda: (jax.devices(), ready.set()),
                     daemon=True).start()
    if not ready.wait(float(os.environ.get(
            "GEOFORMER_BENCH_INIT_TIMEOUT_S", "300"))):
        print("bench.py: accelerator backend init timed out (tunnel down?)",
              file=sys.stderr, flush=True)
        os._exit(2)

    from geoformer_tpu.config import (
        BackboneConfig,
        CoarseTransformerConfig,
        FineTransformerConfig,
        GeoFormerConfig,
        GeoModuleConfig,
        MatchConfig,
    )
    from geoformer_tpu.models import GeoFormer

    B, H, W = args.batch, 480, 640
    cfg = GeoFormerConfig(
        backbone=BackboneConfig(int8=args.int8 or args.int8_full),
        coarse=CoarseTransformerConfig(int8=args.int8_full),
        fine=FineTransformerConfig(
            int8=args.int8_full,
            attention="linear" if args.no_fine_flat else "linear_flat"),
        match=MatchConfig(max_matches=1024),
        geo=GeoModuleConfig(ransac_iters=256, max_inliers=1024,
                            use_pallas=args.pallas,
                            use_pallas_self=not args.no_mka,
                            int8=args.int8_full),
        use_bf16=args.bf16,
    )
    model = GeoFormer(cfg)
    key = jax.random.key(0)
    rng = np.random.default_rng(0)
    # distinct inputs per iteration + a host fetch per iteration: the
    # experimental PJRT plugin has been observed both to return early from
    # block_until_ready and to short-cut repeated identical executions, so
    # only fully-synchronized fresh-input timing is trustworthy here.
    # Round-5 device trace finding: the compiled forward runs GAP-FREE on
    # the device (115.5 ms module, zero internal idle) — the rest of the
    # per-call wall was tunnel round trips for per-iteration bank[i]
    # dynamic-slice modules, a separate reduce_sum dispatch, and the scalar
    # fetch. So: pre-split the input bank at setup (no per-iter device
    # slicing), fold the checksum into the jitted forward (one dispatch,
    # one scalar fetch per iteration), and pipeline at depth 3.
    iters = 12
    bank = [jnp.asarray(rng.random((B, H, W, 1), np.float32))
            for _ in range(iters + 1)]
    params = model.init({"params": key, "ransac": key},
                        bank[0][:1], bank[0][:1])

    @jax.jit
    def fwd(params, i0, i1):
        out = model.apply(params, i0, i1, rngs={"ransac": jax.random.key(0)})
        return out, out.fine.mconf.sum()

    t0 = time.perf_counter()
    out, chk = fwd(params, bank[0], bank[1])
    float(chk)
    compile_s = time.perf_counter() - t0

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out, chk = fwd(params, bank[i], bank[i + 1])
        float(chk)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    # Pipelined (serving-style) throughput: keep up to `depth` forwards in
    # flight before fetching the oldest result, so tunnel round trips and
    # host work overlap device compute. Inputs stay distinct and EVERY
    # checksum is still fetched, so the experimental plugin cannot
    # short-cut executions; the wall-clock over all iterations is an honest
    # end-to-end throughput bound.
    depth = 3
    inflight = []
    t0 = time.perf_counter()
    for i in range(iters):
        _, chk = fwd(params, bank[i], bank[i + 1])
        inflight.append(chk)
        if len(inflight) >= depth:
            float(inflight.pop(0))
    for chk in inflight:
        float(chk)
    pipe_dt = (time.perf_counter() - t0) / iters

    pairs_per_s = B / min(dt, pipe_dt)
    print(f"# compile+first: {compile_s:.1f}s  per-call ms: "
          f"{[round(t * 1e3, 1) for t in times]}  pipelined: "
          f"{pipe_dt * 1e3:.1f} ms/iter", file=sys.stderr, flush=True)

    # ---- MFU accounting (speed-of-light honesty, VERDICT round-1 #5) ----
    # flops from the compiled executable's own cost analysis; peak from the
    # device kind (override with GEOFORMER_PEAK_TFLOPS for new hardware).
    mfu = tflops = None
    try:
        ca = fwd.lower(params, bank[0], bank[1]).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        peaks = {  # dense bf16/f16 peak TFLOP/s per chip
            "TPU v3": 123.0, "TPU v4": 275.0, "TPU v5": 394.0,
            "TPU v5 lite": 197.0, "TPU v5e": 197.0, "TPU v5p": 459.0,
            "TPU v6 lite": 918.0, "TPU v6e": 918.0,
        }
        kind = jax.devices()[0].device_kind
        # longest key first: "TPU v5 lite" must win over its prefix "TPU v5"
        peak = float(os.environ.get("GEOFORMER_PEAK_TFLOPS", 0)) or \
            next((v for k, v in sorted(peaks.items(), key=lambda kv:
                                       -len(kv[0]))
                  if k.lower() in kind.lower()), 0.0)
        if flops > 0:
            tflops = flops / min(dt, pipe_dt) / 1e12
            if peak:
                mfu = tflops / peak
        print(f"# flops/fwd={flops / 1e9:.1f} GF  kind={kind}  "
              f"achieved={tflops if tflops else 0:.2f} TFLOP/s  "
              f"peak={peak} TFLOP/s", file=sys.stderr, flush=True)
    except Exception as e:  # cost analysis unsupported on some plugins
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr, flush=True)

    baseline = 5.0  # reference ~5 pairs/s/GPU at 480px (no published number)
    # Spread: tunnel sessions vary ~15% run-to-run; p10/p90 of per-call
    # times makes a single driver capture interpretable (is this a tight
    # run or a noisy one?) without a second invocation.
    ms = np.sort(np.asarray(times) * 1e3)
    rec = {
        "metric": "matched_pairs_per_s_per_chip_480px",
        "value": round(pairs_per_s, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / baseline, 3),
        "median_ms": round(dt * 1e3, 1),
        "p10_ms": round(float(np.percentile(ms, 10)), 1),
        "p90_ms": round(float(np.percentile(ms, 90)), 1),
        "pipelined_ms": round(pipe_dt * 1e3, 1),
        "n_timed": iters,
    }
    if tflops is not None:
        rec["tflops_per_s"] = round(tflops, 2)
    if mfu is not None:
        rec["mfu"] = round(mfu, 4)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
