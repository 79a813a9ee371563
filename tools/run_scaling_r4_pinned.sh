#!/bin/bash
# Round-4 PINNED N -> 4N scaling trials: same probe-gated protocol as
# run_scaling_r4.sh, but each worker's entire process tree is confined to
# exactly <cores> CPUs via taskset (see scaling_trial_once.py docstring) —
# the faithful stand-in for N-core executor containers. 1-core trials pin
# to CPU 8; 4-core trials pin to CPUs 8-11 (away from CPU 0 irq work).
set -u
INP=${1:-/dev/shm/scaling_input_r4_16m}
LOG=${2:-/root/repo/tools/scaling_trials_r4_pinned.jsonl}
N1=${3:-2}   # 1-core trials to attempt (slow: whole tree on one CPU)
N4=${4:-4}   # 4-core trials to attempt
cd /root/repo
for i in $(seq 1 "$N4"); do
  python tools/scaling_trial_once.py 4 "$INP" "$LOG" 8-11
  if [ "$i" -le "$N1" ]; then
    python tools/scaling_trial_once.py 1 "$INP" "$LOG" 8
  fi
done
echo "done: $(wc -l < "$LOG") records in $LOG"
