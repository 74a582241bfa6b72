#!/bin/bash
# Poll the axon TPU worker; when it answers, launch the round-3 device
# session (tools/r3_session.py) ONCE and exit. Serializes device access:
# the probe subprocess exits before the session starts (CLAUDE.md: one
# client at a time; never kill a client mid-Mosaic-compile — the session
# itself runs detached with no outer timeout).
LOG=/tmp/worker_watch.log
SESSION_LOG=${1:-/tmp/r3_session3.log}
cd "$(dirname "$0")/.."
while true; do
  if [ -n "$(git status --porcelain -- meso_tpu tools 2>/dev/null)" ]; then
    # never launch the device session from a mid-edit tree
    echo "$(date -u) tree dirty — holding launch" >> "$LOG"
    sleep 120
    continue
  fi
  if timeout 110 python -c "import jax, jax.numpy as jnp; print(int(jnp.arange(8).sum()))" > /tmp/probe.out 2>&1 \
     && grep -q '^28$' /tmp/probe.out; then
    echo "$(date -u) worker UP — launching r3 session -> $SESSION_LOG" >> "$LOG"
    nohup python tools/r3_session.py > "$SESSION_LOG" 2>&1 &
    echo $! > /tmp/r3_session.pid
    exit 0
  fi
  echo "$(date -u) worker down" >> "$LOG"
  sleep 600
done
