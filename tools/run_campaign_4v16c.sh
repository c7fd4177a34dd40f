#!/bin/bash
# Round-5 4v16 scaling campaign "4v16c": two more interleaved pairs
# (16,4,16,4) on the cached 85M-edge table, with a 30s /proc/stat steal
# monitor. Pooled with scaling_result_4v16_r4.json this brings the 4v16
# population to >=30 steady samples per level (judge criterion, VERDICT
# r2 item 7 / ADVICE r4).
set -u
cd /root/repo
NAME=4v16c_r5

# steal monitor: epoch, user, idle, steal cumulative ticks. Truncate per
# run with a start marker so reruns never interleave epochs in one file,
# and kill via EXIT trap so an interrupted campaign cannot leave the
# monitor running forever (ADVICE r5).
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

SCALING_N_CONVS=11200000 SCALING_SEQUENCE=16,4,16,4 \
  python3 tools/bench_scaling.py > BENCH/scaling_${NAME}_run.log 2>&1
RC=$?

if [ $RC -eq 0 ] && [ -f BENCH/scaling_result.json ]; then
  cp BENCH/scaling_result.json BENCH/scaling_result_${NAME}.json
  # campaign complete: remove the in-flight partial so a later
  # SCALING_RESUME=1 run can never seed stale samples (ADVICE r5)
  rm -f BENCH/scaling_partial.json
fi
git checkout -- BENCH/scaling_result.json 2>/dev/null
echo "campaign ${NAME} done rc=$RC" >> BENCH/scaling_${NAME}_run.log
