#!/bin/bash
# Round-4 N -> 4N scaling trials (same protocol as rounds 2-3):
# probe-gated trials alternating 1-core and 4-core pipeline runs over the
# same 4M-turn tmpfs input; every attempt (run or contended-skip) appended
# to tools/scaling_trials_r4.jsonl. Minimum wall per level is the
# estimator (box-noise protocol: starvation only ever ADDS time).
set -u
INP=${1:-/dev/shm/scaling_input_r4}
LOG=${2:-/root/repo/tools/scaling_trials_r4.jsonl}
N1=${3:-3}   # 1-core trials to attempt
N4=${4:-5}   # 4-core trials to attempt
cd /root/repo
for i in $(seq 1 "$N4"); do
  python tools/scaling_trial_once.py 4 "$INP" "$LOG"
  if [ "$i" -le "$N1" ]; then
    python tools/scaling_trial_once.py 1 "$INP" "$LOG"
  fi
done
echo "done: $(wc -l < "$LOG") records in $LOG"
