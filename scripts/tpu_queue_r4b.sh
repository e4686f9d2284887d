#!/bin/bash
# Round-4 TPU stage 2: waits for stage 1 (tpu_queue_r4.sh) to finish, then
# runs the sensor-aug A/B training run (VERDICT r3 #6) + its selfchecks.
# Launch detached: nohup setsid bash scripts/tpu_queue_r4b.sh &
set -u
cd /root/repo
mkdir -p /tmp/r4_logs

until grep -q "QUEUE COMPLETE" /tmp/r4_logs/queue.log 2>/dev/null; do
  sleep 120
done
echo "$(date +%H:%M:%S) stage-1 complete — starting sensor-aug training" \
  | tee -a /tmp/r4_logs/queue.log

# Same recipe as the committed headline (12k steps, f32+pallas, mix-0,
# batch 4, seed 66) with ONLY --sensor-aug flipped on: a clean A/B against
# checkpoints/tpu_r3_main (RESULTS.md round-3 headline row).
timeout 14400 python -m geoformer_tpu.cli train --steps 12000 --batch 4 \
  --pallas --sensor-aug --out checkpoints/tpu_r4_sensor --log-every 100 \
  > /tmp/r4_logs/train_sensor.log 2>&1
echo "$(date +%H:%M:%S) train rc=$? — selfchecks" | tee -a /tmp/r4_logs/queue.log

for probe in "" "--image held-out-photos"; do
  timeout 2400 python scripts/selfcheck_eval.py \
    --ckpt checkpoints/tpu_r4_sensor/params_final.npz $probe \
    >> /tmp/r4_logs/selfcheck_sensor.log 2>&1
  echo "--- done: selfcheck $probe rc=$?" >> /tmp/r4_logs/selfcheck_sensor.log
done
echo "$(date +%H:%M:%S) STAGE2 COMPLETE" | tee -a /tmp/r4_logs/queue.log
