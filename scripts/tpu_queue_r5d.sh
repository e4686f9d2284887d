#!/bin/bash
# Round-5 TPU queue, stage 4: retrain the depth-supervised path on the
# CLUTTERED corpus (v2) — the plain-room corpus collapsed the capacity-
# ranked match set onto the back wall, making the essential-matrix pose
# validation degenerate (RESULTS.md round 5). Waits for stage 3.
#   nohup setsid bash scripts/tpu_queue_r5d.sh &
set -u
cd /root/repo
mkdir -p /tmp/r5_logs

until grep -q "STAGE3 COMPLETE" /tmp/r5_logs/queue.log 2>/dev/null; do
  sleep 120
done
until [ -d /tmp/depth_corpus2/index_val ]; do sleep 60; done

echo "$(date +%H:%M:%S) stage 4 — depth training on cluttered corpus" \
  | tee -a /tmp/r5_logs/queue.log
timeout 10800 python -m geoformer_tpu.cli train-depth \
  --npz-dir /tmp/depth_corpus2/index --root /tmp/depth_corpus2 \
  --val-npz-dir /tmp/depth_corpus2/index_val --depth-pad 640 \
  --steps 4000 --batch 4 --pallas --log-every 100 --val-every 500 \
  --out checkpoints/tpu_r5_depth2 \
  > /tmp/r5_logs/train_depth2.log 2>&1
echo "$(date +%H:%M:%S) depth2 train rc=$?" | tee -a /tmp/r5_logs/queue.log
echo "$(date +%H:%M:%S) STAGE4 COMPLETE" | tee -a /tmp/r5_logs/queue.log
