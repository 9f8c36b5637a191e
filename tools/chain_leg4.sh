#!/bin/bash
# Round-5 leg chaining: wait for the leg-3 trainer (pid in /tmp/r5_train.pid)
# to exit, then immediately launch leg 4 — the r3-playbook lr anneal step
# (1.5e-5 -> 5e-6 at batch 64) resumed from the newest checkpoint — via the
# backend-probing watcher so a tunnel outage delays, not kills, the launch.
set -u
LEG3_PID=$(cat /tmp/r5_train.pid)
while kill -0 "$LEG3_PID" 2>/dev/null; do sleep 30; done
echo "$(date +%s) leg3 (pid $LEG3_PID) exited; launching leg4" >> /tmp/r5_watch.log
cd /root/repo
bash tools/tpu_watch_launch.sh python examples/train_codec_corpus.py \
  --steps 78000 --batch 64 --lr 5e-6 --warmup 100 --eval-every 250 \
  --no-gp --adv-weight 0 --feat-weight 0 --recon-weight 10 \
  --si-snr-weight 1.0 --channels 48 --resume latest \
  --curve quality_curve_r5_leg4.jsonl
echo "leg4 launched: pid $(cat /tmp/r5_train.pid)"
