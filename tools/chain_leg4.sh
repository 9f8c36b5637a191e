#!/bin/bash
# Round-5 leg chaining, session-3 revision: leg 3 (batch 64, lr 1.5e-5) is
# still climbing ~0.3 dB/1k at 63k, so do NOT anneal yet — r3 playbook says
# drop lr only when the current lr's progress slows. Chain:
#   leg 4: continue lr 1.5e-5 const to 73k  (quality_curve_r5_leg4.jsonl)
#   leg 5: anneal   lr 5e-6        to 79k  (quality_curve_r5_leg5.jsonl)
# Each launch goes through the backend-probing watcher so a tunnel outage
# delays, not kills, the launch. Sized to finish ~01:30Z for end-of-round
# persist + category eval + clean commit.
set -u
cd /root/repo

wait_for_exit() { # pid
  echo "$(date +%s) waiting on trainer pid $1" >> /tmp/r5_watch.log
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
  echo "$(date +%s) trainer pid $1 exited" >> /tmp/r5_watch.log
}

launch_leg() { # steps lr curve -> echoes new pid once the watcher wrote it
  local old_pid
  old_pid=$(cat /tmp/r5_train.pid 2>/dev/null || echo 0)
  bash tools/tpu_watch_launch.sh python examples/train_codec_corpus.py \
    --steps "$1" --batch 64 --lr "$2" --warmup 100 --eval-every 250 \
    --no-gp --adv-weight 0 --feat-weight 0 --recon-weight 10 \
    --si-snr-weight 1.0 --channels 48 --resume latest \
    --curve "$3" >> /tmp/r5_watch.log 2>&1
  # the watcher only writes the pidfile when the backend answers; poll until
  # it holds a NEW live pid so a tunnel outage can't make us skip a leg
  while true; do
    local p
    p=$(cat /tmp/r5_train.pid 2>/dev/null || echo 0)
    if [ "$p" != "$old_pid" ] && kill -0 "$p" 2>/dev/null; then
      echo "$p"
      return
    fi
    sleep 15
  done
}

wait_for_exit "$(cat /tmp/r5_train.pid)"      # leg 3 (running now, to 66k)
LEG4=$(launch_leg 73000 1.5e-5 quality_curve_r5_leg4.jsonl)
wait_for_exit "$LEG4"
LEG5=$(launch_leg 79000 5e-6 quality_curve_r5_leg5.jsonl)
echo "$(date +%s) leg5 launched: pid $LEG5" >> /tmp/r5_watch.log
