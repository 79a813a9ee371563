"""One scaling-bench trial: run the full pipeline at a given core count.

Usage: python tools/scaling_worker.py <cores> <input_parquet> <output_dir>
Prints one JSON line: {"cores": N, "turns": N, "wall_s": S, "turns_per_sec": T}

Run as a fresh process per trial (a SparkSession's master is fixed for the
process lifetime).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from log_analysis_system_spark.pipeline import run_pipeline  # noqa: E402
from log_analysis_system_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores, inp, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    scratch = os.environ.get("SCALING_SCRATCH", "/dev/shm/spark_scaling")
    # tasks-per-core factor: >1 gives every stage multiple waves so a
    # straggling (host-starved) task costs one small task, not the stage.
    tpc = int(os.environ.get("SCALING_TASKS_PER_CORE", "3"))
    spark = get_spark(
        app_name=f"scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * tpc,
        # tmpfs scratch: this VM's disk is IOPS-throttled under concurrent
        # writers (16-core runs measured 2-4x slower than 4-core on disk);
        # cluster nodes have NVMe-backed shuffle dirs, tmpfs models that.
        extra_conf={"spark.local.dir": f"{scratch}/local"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.parquet(inp)
    n = transcripts.count()

    # Warm-up: a small end-to-end run spins up Python workers, compiles
    # codegen, and initializes committers — steady-state throughput is the
    # quantity that scales to a long-running cluster job, not cold start.
    warm_out = f"{scratch}/warmup{cores}"
    shutil.rmtree(warm_out, ignore_errors=True)
    run_pipeline(spark, transcripts.limit(20000), warm_out,
                 run_id="warmup", resume=False, n_buckets=cores * tpc)
    shutil.rmtree(warm_out, ignore_errors=True)

    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    run_pipeline(spark, transcripts, out, run_id=f"scale{cores}",
                 resume=False, n_buckets=cores * tpc)
    wall = time.perf_counter() - t0
    print(json.dumps({
        "cores": cores,
        "turns": n,
        "wall_s": round(wall, 2),
        "turns_per_sec": round(n / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
