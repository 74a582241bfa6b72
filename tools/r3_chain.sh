#!/bin/bash
# Round-3 device chain: poll the axon worker; when it answers, run the
# v3 re-gate (post root-cause fix) then the 1M probe, sequentially, in
# ONE device client at a time (CLAUDE.md r3 rules: no concurrent clients,
# no mid-compile kills, long single-attempt budgets).
LOG=/tmp/r3_chain.log
cd "$(dirname "$0")/.."
echo "$(date -u) chain start" >> "$LOG"
while true; do
  if timeout 110 python -c "import jax, jax.numpy as jnp; print(int(jnp.arange(8).sum()))" > /tmp/probe.out 2>&1 \
     && grep -q '^28$' /tmp/probe.out; then
    echo "$(date -u) worker UP" >> "$LOG"
    break
  fi
  echo "$(date -u) worker down" >> "$LOG"
  sleep 120
done
echo "$(date -u) gate3 start" >> "$LOG"
python tools/v3_gate3.py > /tmp/gate3.log 2>&1
echo "$(date -u) gate3 done rc=$? -- 1M probe start" >> "$LOG"
python tools/v3_1m_probe.py > /tmp/v3_1m.log 2>&1
echo "$(date -u) 1M probe done rc=$?" >> "$LOG"
echo "R3_CHAIN_DONE" >> "$LOG"
