#!/bin/bash
# Round-4 TPU stage 3: waits for stage 1+2 (tpu_queue_r4c.sh) to finish,
# then measures the post-adoption state: bench with the new fine-flat
# default, the fixed ablation-2 config rig, the 540-pair gate on the
# sensor-aug checkpoint (A/B vs tpu_r3_main's 0.876/0.951/0.971/0.985),
# and a TPU parity-drill rehearsal.
# Launch detached: nohup setsid bash scripts/tpu_queue_r4d.sh &
set -u
cd /root/repo
mkdir -p /tmp/r4_logs

until grep -q "QUEUE COMPLETE" /tmp/r4_logs/queue.log 2>/dev/null; do
  sleep 120
done

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
run() {
  local name=$1 tmo=$2; shift 2
  wait_tunnel
  echo "$(date +%H:%M:%S) START $name" | tee -a /tmp/r4_logs/queue.log
  timeout "$tmo" "$@" > "/tmp/r4_logs/$name.log" 2>&1
  echo "$(date +%H:%M:%S) DONE  $name rc=$?" | tee -a /tmp/r4_logs/queue.log
}

run bench_fineflat_default 2400 python bench.py
run ablation2b 3600 python scripts/profile_ablation2.py
if [ -f checkpoints/tpu_r4_sensor/params_final.npz ]; then
  run hpatches540_sensor 7200 python scripts/hpatches_protocol.py \
    --ckpt checkpoints/tpu_r4_sensor/params_final.npz --bf16 --pallas
fi
run parity_drill_tpu 3600 python scripts/parity_drill.py --max-seqs 20 \
  --bf16 --pallas --expect 0.876,0.951,0.971,0.985

echo "$(date +%H:%M:%S) STAGE3 COMPLETE" | tee -a /tmp/r4_logs/queue.log
