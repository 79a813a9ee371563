#!/bin/bash
# Round-4 PINNED N -> 4N scaling trials (the container-faithful protocol).
#
# Two fixes over the unpinned series (see scaling_trial_once.py docstring):
#
# 1. taskset pinning: each worker's WHOLE process tree (JVM task threads,
#    GC, pyspark daemon + Arrow UDF workers, committers) is confined to
#    exactly <cores> CPUs — like an executor container's cpu allotment.
#    Unpinned, a local[1] trial measured ~2.2 host cores of concurrent CPU,
#    flattering the small level.
# 2. 2 vs 8 cores (not 1 vs 4): the north rule scales EXECUTORS (multi-core
#    containers), so both levels must have the same executor shape. A
#    pinned 1-CPU level degenerates (JVM and Python worker context-switch
#    on one CPU — the known pathology of 1-core executors for pandas-UDF
#    jobs, and why real clusters don't deploy them); 2 vs 8 keeps the
#    JVM/Python overlap ratio identical at both levels with the same 4x
#    parallelism ratio the rule demands.
#
# CPUs 8-15 are used (away from CPU 0's irq/system work).
set -u
INP=${1:-/dev/shm/scaling_input_r4_16m}
LOG=${2:-/root/repo/tools/scaling_trials_r4_pinned.jsonl}
N2=${3:-3}   # 2-core trials to attempt
N8=${4:-4}   # 8-core trials to attempt
cd /root/repo
for i in $(seq 1 "$N8"); do
  python tools/scaling_trial_once.py 8 "$INP" "$LOG" 8-15
  if [ "$i" -le "$N2" ]; then
    python tools/scaling_trial_once.py 2 "$INP" "$LOG" 8-9
  fi
done
echo "done: $(wc -l < "$LOG") records in $LOG"
