#!/bin/bash
# Round-4 TPU work queue: waits for the tunnel, then runs the measurement
# queue sequentially (ONE tunnel client at a time). Logs land in
# /tmp/r4_logs/. Run under nohup/background; check tails to babysit.
set -u
cd /root/repo
mkdir -p /tmp/r4_logs

probe() {
  timeout 120 python -c "
from geoformer_tpu.core.platform import respect_platform_env
respect_platform_env()
import jax; print(jax.devices())" >/dev/null 2>&1
}

echo "$(date +%H:%M:%S) waiting for tunnel..." | tee /tmp/r4_logs/queue.log
until probe; do
  echo "$(date +%H:%M:%S) tunnel still down" >> /tmp/r4_logs/queue.log
  sleep 180
done
echo "$(date +%H:%M:%S) tunnel UP — starting queue" | tee -a /tmp/r4_logs/queue.log

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "$(date +%H:%M:%S) START $name" | tee -a /tmp/r4_logs/queue.log
  timeout "$tmo" "$@" > "/tmp/r4_logs/$name.log" 2>&1
  local rc=$?
  echo "$(date +%H:%M:%S) DONE  $name rc=$rc" | tee -a /tmp/r4_logs/queue.log
}

run ablation2     3600 python scripts/profile_ablation2.py
run bench_default 1800 python bench.py
run bench_fineflat 1800 python bench.py --fine-flat
run bench_int8    1800 python bench.py --int8
run bench_int8full 1800 python bench.py --int8-full
run selfcheck_int8full 2400 python scripts/selfcheck_eval.py --int8-full --pallas
run ate_protocol  2400 python scripts/ate_protocol.py
run localize_protocol 2400 python scripts/localize_protocol.py
run hpatches540   7200 python scripts/hpatches_protocol.py --bf16 --pallas

echo "$(date +%H:%M:%S) QUEUE COMPLETE" | tee -a /tmp/r4_logs/queue.log
