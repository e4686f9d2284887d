#!/bin/bash
# Round-5 TPU queue, stage 2 (training): the corpus-scale A/B (VERDICT r5
# #6 — headline recipe with ONLY the bank levers changed: 1024-texture bank
# refreshed every 500 steps ~ 25k distinct images over 12k steps, vs the
# fixed 256 bank) and the first REAL depth-supervised schedule (#4) on the
# rendered posed-RGBD corpus. Waits for stage 1's marker. Launch detached:
#   nohup setsid bash scripts/tpu_queue_r5b.sh &
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
    echo "$(date +%H:%M:%S) tunnel still down (b)" >> /tmp/r5_logs/queue.log
    sleep 180
  done
}

until grep -q "STAGE1 COMPLETE" /tmp/r5_logs/queue.log 2>/dev/null; do
  sleep 120
done
wait_tunnel
echo "$(date +%H:%M:%S) stage 2 — corpus-scale training" | tee -a /tmp/r5_logs/queue.log

# A/B: headline recipe (12k steps, batch 4, f32+pallas, procedural-only,
# seed 66) with ONLY --bank-size/--bank-refresh changed vs tpu_r3_main.
timeout 14400 python -m geoformer_tpu.cli train --steps 12000 --batch 4 \
  --pallas --bank-size 1024 --bank-refresh 500 \
  --out checkpoints/tpu_r5_bigcorpus --log-every 100 \
  > /tmp/r5_logs/train_bigcorpus.log 2>&1
echo "$(date +%H:%M:%S) bigcorpus train rc=$? — selfchecks" | tee -a /tmp/r5_logs/queue.log

for probe_args in "" "--image held-out-photos"; do
  timeout 2400 python scripts/selfcheck_eval.py \
    --ckpt checkpoints/tpu_r5_bigcorpus/params_final.npz $probe_args \
    >> /tmp/r5_logs/selfcheck_bigcorpus.log 2>&1
  echo "--- done: selfcheck $probe_args rc=$?" >> /tmp/r5_logs/selfcheck_bigcorpus.log
done
echo "$(date +%H:%M:%S) bigcorpus selfchecks done" | tee -a /tmp/r5_logs/queue.log

wait_tunnel
echo "$(date +%H:%M:%S) stage 2 — depth-supervised training" | tee -a /tmp/r5_logs/queue.log
timeout 10800 python -m geoformer_tpu.cli train-depth \
  --npz-dir /tmp/depth_corpus/index --root /tmp/depth_corpus \
  --val-npz-dir /tmp/depth_corpus/index_val --depth-pad 640 \
  --steps 4000 --batch 4 --pallas --log-every 100 --val-every 500 \
  --out checkpoints/tpu_r5_depth \
  > /tmp/r5_logs/train_depth.log 2>&1
echo "$(date +%H:%M:%S) depth train rc=$?" | tee -a /tmp/r5_logs/queue.log

echo "$(date +%H:%M:%S) STAGE2 COMPLETE" | tee -a /tmp/r5_logs/queue.log
