"""One probe-gated scaling trial: probe the host; if the window is clean,
run a single scaling_worker trial at the requested core count and append a
JSON line (probe + trial) to the log file. If contended, log the probe and
exit 3 without burning a trial.

Usage: python tools/scaling_trial_once.py <cores> <input_dir> <log_file> [cpuset]

``cpuset`` (e.g. ``8`` or ``8-11``) pins the worker's ENTIRE process tree —
JVM task threads, GC, pyspark daemon + UDF workers, committers — to that
CPU set via ``taskset -c``. Without pinning, a ``local[1]`` trial measured
~2.2 host cores of concurrent CPU (JVM 155% + pyspark worker 65%: the
Python workers and GC run on cores the "1-core" label doesn't count),
inflating the small level and understating N->4N efficiency. Pinning is
the faithful stand-in for the north rule's N-core executor *container*,
where every helper thread/process shares the container's CPU allotment.
The cpuset is recorded in the JSON line; give it exactly ``cores`` CPUs.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from hostprobe import probe  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    cores, inp, log = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    cpuset = sys.argv[4] if len(sys.argv) > 4 else None
    h = probe()
    rec = {"cores": cores, "probe": h}
    if cpuset is not None:
        rec["cpuset"] = cpuset
    if not h["clean"]:
        rec["skipped"] = True
        with open(log, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))
        return 3
    out = tempfile.mkdtemp(prefix=f"scaling_out{cores}_", dir="/dev/shm")
    try:
        cmd = [sys.executable, os.path.join(REPO, "tools", "scaling_worker.py"),
               str(cores), inp, out]
        if cpuset is not None:
            cmd = ["taskset", "-c", cpuset] + cmd
        res = subprocess.run(cmd, capture_output=True, text=True, check=True)
        rec["trial"] = json.loads(res.stdout.strip().splitlines()[-1])
    finally:
        shutil.rmtree(out, ignore_errors=True)
    rec["probe_after"] = probe()
    with open(log, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
