"""Measure the fixed per-job overhead of ``run_pipeline`` at a given core count.

The N -> 4N scaling trials (tools/scaling_worker.py) time one warm
``run_pipeline`` call end-to-end. That wall has two parts:

  wall(n_turns) = oh + n_turns / rate

where ``oh`` is the per-job fixed cost — driver-side analysis/codegen of the
five sink plans, sink commit protocol, state-table read/merge/write — which
is constant in input size and does NOT shrink with cores. On a real cluster
running the north-star 10^12-turn job, ``oh`` (seconds) is negligible
against hours of compute; at the sandbox's 4M-turn trial size it is a
visible fraction of the 4-core wall and suppresses the measured
strong-scaling ratio. This tool quantifies ``oh`` directly by running the
SAME warm pipeline at two small input sizes and solving the two-point
linear model, repeated ``reps`` times with the minimum wall per size as the
estimator (the box-noise protocol: starvation only ever adds time).

Usage: python tools/overhead_probe.py <cores> [n_small] [n_large] [reps]
Prints one JSON line:
  {"cores": N, "walls_small": [...], "walls_large": [...],
   "oh_s": ..., "rate_tps": ...}
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from log_analysis_system_spark.datagen.transcripts import write_transcripts  # noqa: E402
from log_analysis_system_spark.pipeline import run_pipeline  # noqa: E402
from log_analysis_system_spark.session import get_spark  # noqa: E402

SCRATCH = "/dev/shm/overhead_probe"


def main() -> None:
    cores = int(sys.argv[1])
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000
    n_large = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    tpc = 3  # same tasks-per-core factor as scaling_worker.py

    shutil.rmtree(SCRATCH, ignore_errors=True)
    spark = get_spark(
        app_name=f"overhead-probe-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * tpc,
        extra_conf={"spark.local.dir": f"{SCRATCH}/local"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    inputs = {}
    for n in (n_small, n_large):
        path = f"{SCRATCH}/in_{n}"
        write_transcripts(spark, path, n_turns=n, n_convs=max(100, n // 200))
        inputs[n] = spark.read.parquet(path)

    # Warm-up: same protocol as scaling_worker.py (python workers, codegen,
    # committers) so the measured walls are steady-state.
    run_pipeline(spark, inputs[n_small], f"{SCRATCH}/warm", run_id="warmup",
                 resume=False, n_buckets=cores * tpc)

    walls: dict[int, list[float]] = {n_small: [], n_large: []}
    for _ in range(reps):
        for n in (n_small, n_large):
            out = f"{SCRATCH}/out_{n}"
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.perf_counter()
            run_pipeline(spark, inputs[n], out, run_id=f"oh{n}",
                         resume=False, n_buckets=cores * tpc)
            walls[n].append(round(time.perf_counter() - t0, 2))

    w_s, w_l = min(walls[n_small]), min(walls[n_large])
    rate = (n_large - n_small) / max(w_l - w_s, 1e-9)
    oh = w_s - n_small / rate
    print(json.dumps({
        "cores": cores,
        "n_small": n_small, "walls_small": walls[n_small],
        "n_large": n_large, "walls_large": walls[n_large],
        "oh_s": round(oh, 2), "rate_tps": round(rate, 1),
    }))
    spark.stop()
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
