#!/bin/bash
# Round-4 TPU queue, reordered after the machine restart killed the first
# launch: highest-value measurements first so an outage mid-queue still
# leaves the round with its headline numbers. ONE tunnel client at a time.
# Logs: /tmp/r4_logs/. Launch: nohup setsid bash scripts/tpu_queue_r4c.sh &
set -u
cd /root/repo
mkdir -p /tmp/r4_logs

probe() {
  timeout 120 python -c "
from geoformer_tpu.core.platform import respect_platform_env
respect_platform_env()
import jax; print(jax.devices())" >/dev/null 2>&1
}

wait_tunnel() {
  until probe; do
    echo "$(date +%H:%M:%S) tunnel down — waiting" >> /tmp/r4_logs/queue.log
    sleep 180
  done
}

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  wait_tunnel
  echo "$(date +%H:%M:%S) START $name" | tee -a /tmp/r4_logs/queue.log
  timeout "$tmo" "$@" > "/tmp/r4_logs/$name.log" 2>&1
  local rc=$?
  echo "$(date +%H:%M:%S) DONE  $name rc=$rc" | tee -a /tmp/r4_logs/queue.log
}

echo "$(date +%H:%M:%S) queue r4c starting" | tee -a /tmp/r4_logs/queue.log

run bench_default  2400 python bench.py
run hpatches540    7200 python scripts/hpatches_protocol.py --bf16 --pallas
run bench_int8full 2400 python bench.py --int8-full
run selfcheck_int8full 2400 python scripts/selfcheck_eval.py --int8-full --pallas
run ate_protocol   2400 python scripts/ate_protocol.py
run localize_protocol 2400 python scripts/localize_protocol.py
run bench_fineflat 2400 python bench.py --no-fine-flat  # A/B vs the (now-default) flat fine stack
run bench_b16      2400 python bench.py --batch 16
run ablation2      3600 python scripts/profile_ablation2.py

echo "$(date +%H:%M:%S) STAGE1 COMPLETE" | tee -a /tmp/r4_logs/queue.log

# Sensor-aug A/B training (VERDICT r3 #6): same recipe as the committed
# headline (12k steps, f32+pallas, mix-0, batch 4) with ONLY --sensor-aug
# flipped on; clean A/B against checkpoints/tpu_r3_main.
wait_tunnel
echo "$(date +%H:%M:%S) START train_sensor" | tee -a /tmp/r4_logs/queue.log
timeout 10800 python -m geoformer_tpu.cli train --steps 12000 --batch 4 \
  --pallas --sensor-aug --out checkpoints/tpu_r4_sensor --log-every 100 \
  > /tmp/r4_logs/train_sensor.log 2>&1
echo "$(date +%H:%M:%S) DONE  train_sensor rc=$?" | tee -a /tmp/r4_logs/queue.log

for probe_args in "" "--image held-out-photos"; do
  wait_tunnel
  timeout 2400 python scripts/selfcheck_eval.py \
    --ckpt checkpoints/tpu_r4_sensor/params_final.npz $probe_args \
    >> /tmp/r4_logs/selfcheck_sensor.log 2>&1
  echo "--- done: selfcheck $probe_args rc=$?" >> /tmp/r4_logs/selfcheck_sensor.log
done
echo "$(date +%H:%M:%S) QUEUE COMPLETE" | tee -a /tmp/r4_logs/queue.log
