#!/bin/bash
# Probe the TPU backend every 120 s; when it answers, launch the command
# given as "$@" in the background (nohup) and exit. The round-4/5 tunnel
# flaps for ~an hour at a time — training must start the second it returns.
LOG=/tmp/r5_watch.log
echo "$(date +%s) watcher start: $*" >> "$LOG"
while true; do
  if timeout 100 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); print(float((x @ x).sum()))" >/dev/null 2>&1; then
    echo "$(date +%s) TPU UP — launching" >> "$LOG"
    nohup "$@" > /tmp/r5_train.log 2>&1 &
    echo $! > /tmp/r5_train.pid
    echo "$(date +%s) launched pid $(cat /tmp/r5_train.pid)" >> "$LOG"
    exit 0
  fi
  echo "$(date +%s) DOWN" >> "$LOG"
  sleep 120
done
