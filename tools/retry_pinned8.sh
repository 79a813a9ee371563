#!/bin/bash
# Retry pinned 8-core scaling trials until 2 succeed (probe-gated); 60s
# backoff after a contended-window skip. Appends to the r4 pinned log.
set -u
INP=${1:-/dev/shm/scaling_input_r4_16m}
LOG=${2:-/root/repo/tools/scaling_trials_r4_pinned.jsonl}
WANT=${3:-2}
MAX=${4:-60}
cd /root/repo
got=0
for i in $(seq 1 "$MAX"); do
  if python tools/scaling_trial_once.py 8 "$INP" "$LOG" 8-15; then
    got=$((got+1))
    [ "$got" -ge "$WANT" ] && break
    sleep 20
  else
    sleep 60
  fi
done
echo "retry_pinned8 done: $got successful trials"
