#!/bin/bash
# Second device chain: wait for the 1M probe to finish (one client at a
# time), then re-gate the value-carried v2 family and retry the tea tier
# at 1M with smaller lane vectors.
LOG=/tmp/r3_chain.log
cd "$(dirname "$0")/.."
while ! grep -q "1M probe done" "$LOG" 2>/dev/null; do
  sleep 60
done
echo "$(date -u) v2 gate start" >> "$LOG"
python tools/v2_gate.py > /tmp/v2gate.log 2>&1
echo "$(date -u) v2 gate done rc=$? -- tea1m start" >> "$LOG"
python tools/tea1m.py > /tmp/tea1m.log 2>&1
echo "$(date -u) tea1m done rc=$?" >> "$LOG"
echo "R3_CHAIN2_DONE" >> "$LOG"
