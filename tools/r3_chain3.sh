#!/bin/bash
# Third device chain: after chain2 (v2 gate + tea1m), run the rebuild
# stage breakdown — the data for the incremental-rebuild design
# (VERDICT item 5; rebuild is now ~half the 83.8 ms step at 1M).
LOG=/tmp/r3_chain.log
cd "$(dirname "$0")/.."
while ! grep -q "R3_CHAIN2_DONE" "$LOG" 2>/dev/null; do
  sleep 60
done
echo "$(date -u) rebuild breakdown start" >> "$LOG"
python tools/rebuild_breakdown.py > /tmp/rbk.log 2>&1
echo "$(date -u) rebuild breakdown done rc=$?" >> "$LOG"
echo "R3_CHAIN3_DONE" >> "$LOG"
