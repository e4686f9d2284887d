#!/bin/bash
# Round-5 TPU queue, stage 1 (measurements): FIRE/ISC synthetic gates
# (VERDICT r5 #1), the 540-pair HPatches gate on the de-saturated corpus at
# three match capacities (#3 + #7 + standing gate), a device trace (#2),
# and the standing ATE gate. ONE tunnel client at a time; logs in
# /tmp/r5_logs/. Launch detached:  nohup setsid bash scripts/tpu_queue_r5.sh &
set -u
cd /root/repo
mkdir -p /tmp/r5_logs

probe() {
  timeout 120 python -c "
from geoformer_tpu.core.platform import respect_platform_env
respect_platform_env()
import jax; print(jax.devices())" >/dev/null 2>&1
}

wait_tunnel() {
  until probe; do
    echo "$(date +%H:%M:%S) tunnel still down" >> /tmp/r5_logs/queue.log
    sleep 180
  done
}

echo "$(date +%H:%M:%S) waiting for tunnel..." | tee -a /tmp/r5_logs/queue.log
wait_tunnel
echo "$(date +%H:%M:%S) tunnel UP — stage 1" | tee -a /tmp/r5_logs/queue.log

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "$(date +%H:%M:%S) START $name" | tee -a /tmp/r5_logs/queue.log
  timeout "$tmo" "$@" > "/tmp/r5_logs/$name.log" 2>&1
  local rc=$?
  echo "$(date +%H:%M:%S) DONE  $name rc=$rc" | tee -a /tmp/r5_logs/queue.log
}

run fire_isc      7200 python scripts/fire_isc_protocol.py --bf16 --pallas
run hp540_1024    7200 python scripts/hpatches_protocol.py --bf16 --pallas
run hp540_512     7200 python scripts/hpatches_protocol.py --bf16 --pallas --max-matches 512
run hp540_768     7200 python scripts/hpatches_protocol.py --bf16 --pallas --max-matches 768
run trace         3600 python scripts/profile_trace.py
run ate_protocol  2400 python scripts/ate_protocol.py

echo "$(date +%H:%M:%S) STAGE1 COMPLETE" | tee -a /tmp/r5_logs/queue.log
