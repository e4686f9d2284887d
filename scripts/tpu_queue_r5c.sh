#!/bin/bash
# Round-5 TPU queue, stage 3 (final measurements): 540-pair gate on the
# bigcorpus checkpoint (high-precision corpus-scale A/B), bench of record
# with the resize-v3 matmuls, and a confirming device trace.
#   nohup setsid bash scripts/tpu_queue_r5c.sh &
set -u
cd /root/repo
mkdir -p /tmp/r5_logs

until grep -q "STAGE2 COMPLETE" /tmp/r5_logs/queue.log 2>/dev/null; do
  sleep 120
done

run() {
  local name=$1 tmo=$2; shift 2
  echo "$(date +%H:%M:%S) START $name" | tee -a /tmp/r5_logs/queue.log
  timeout "$tmo" "$@" > "/tmp/r5_logs/$name.log" 2>&1
  echo "$(date +%H:%M:%S) DONE  $name rc=$?" | tee -a /tmp/r5_logs/queue.log
}

run bench_final   2400 python bench.py
run hp540_bigcorpus 7200 python scripts/hpatches_protocol.py --bf16 --pallas \
  --ckpt checkpoints/tpu_r5_bigcorpus/params_final.npz
run trace_final   3600 python scripts/profile_trace.py

echo "$(date +%H:%M:%S) STAGE3 COMPLETE" | tee -a /tmp/r5_logs/queue.log
