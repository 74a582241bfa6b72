#!/bin/bash
# r5 session A driver: runs the device stages SEQUENTIALLY (one TPU client
# at a time — CLAUDE.md), each with a device health probe + wait first and
# a LONG single-attempt timeout (short retries re-wedge slow compiles).
# Logs land in /tmp/r5a_<stage>.log; run this script itself under nohup.
set -u
cd "$(dirname "$0")/.."

probe() {
  # a DOWN worker HANGS; probe in a subprocess with a hard timeout
  timeout 120 python -c "import jax, jax.numpy as jnp; print(int(jnp.arange(8).sum()))" 2>/dev/null | grep -q 28
}

wait_device() {
  local t0=$(date +%s)
  while ! probe; do
    local dt=$(( $(date +%s) - t0 ))
    if [ $dt -gt 5400 ]; then
      echo "[r5a] worker down ${dt}s — giving up on wait" >&2
      return 1
    fi
    echo "[r5a] worker down ${dt}s; re-probing in 180s" >&2
    sleep 180
  done
  return 0
}

stage() {
  local name=$1 tmo=$2
  echo "[r5a] === stage $name (timeout ${tmo}s) $(date -u +%H:%M:%S) ==="
  wait_device || { echo "[r5a] $name SKIPPED (no device)"; return; }
  timeout "$tmo" python -u "tools/r5a_$name.py" > "/tmp/r5a_$name.log" 2>&1
  echo "[r5a] $name rc=$? tail:"
  tail -3 "/tmp/r5a_$name.log"
}

stage stage 5400
stage wrap 3600
stage tune 7200
stage tea 3600
stage transport 3600
stage bf16 2400
echo "[r5a] ALL DONE $(date -u +%H:%M:%S)"
