#!/bin/bash
# Completes the round-5 "4v16c" campaign: legs 1-3 (16,4,16) are seeded
# from the committed BENCH/scaling_partial.json via SCALING_RESUME=1
# (same sequence + population), so only the final 4-core leg runs.
# ADVICE r5 fixes applied: steal log truncated per run with a start
# marker, monitor killed via EXIT trap (no lingering sleep child), and
# scaling_partial.json deleted once the campaign completes so no later
# run can seed stale samples.
set -u
cd /root/repo
NAME=4v16c_r6

echo "# run start $(date +%s)" > BENCH/steal_${NAME}.log
(
  while true; do
    read -r _ user nice system idle iowait irq softirq steal _ < /proc/stat
    echo "$(date +%s) $user $idle $steal"
    sleep 30
  done
) >> BENCH/steal_${NAME}.log &
MON=$!
trap 'kill $MON 2>/dev/null; wait $MON 2>/dev/null' EXIT

SCALING_RESUME=1 SCALING_N_CONVS=11200000 SCALING_SEQUENCE=16,4,16,4 \
  python3 tools/bench_scaling.py > BENCH/scaling_${NAME}_run.log 2>&1
RC=$?

if [ $RC -eq 0 ] && [ -f BENCH/scaling_result.json ]; then
  cp BENCH/scaling_result.json BENCH/scaling_result_${NAME}.json
  rm -f BENCH/scaling_partial.json
fi
git checkout -- BENCH/scaling_result.json 2>/dev/null
echo "campaign ${NAME} done rc=$RC" >> BENCH/scaling_${NAME}_run.log
