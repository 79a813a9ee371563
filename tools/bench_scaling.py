"""Scaling-efficiency bench: the same pipeline job at N and 4N cores.

Sandbox stand-in for the north rule's "N vs 4N executors >= 0.8 scaling
efficiency" — no real cluster here, so parallelism scales via local[N]
worker processes on identical parquet input.

Usage: python tools/bench_scaling.py [n_turns] [small_cores] [big_cores]
Prints a JSON summary and appends nothing (BASELINE.md records results).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gen_input(path: str, n_turns: int) -> None:
    from log_analysis_system_spark.datagen.transcripts import write_transcripts
    from log_analysis_system_spark.session import get_spark

    spark = get_spark("scaling-datagen")
    spark.sparkContext.setLogLevel("ERROR")
    write_transcripts(spark, path, n_turns=n_turns, n_convs=max(100, n_turns // 200))
    spark.stop()


def trial(cores: int, inp: str, out: str, repeat: int = 2) -> dict:
    """Best-of-N fresh-process runs (shared-box contention makes single
    trials noisy — observed 29s vs 50s on identical input)."""
    best = None
    for _ in range(repeat):
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "scaling_worker.py"),
             str(cores), inp, out],
            capture_output=True, text=True, check=True,
        )
        r = json.loads(res.stdout.strip().splitlines()[-1])
        if best is None or r["wall_s"] < best["wall_s"]:
            best = r
    return best


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    big = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    work = tempfile.mkdtemp(prefix="scaling_bench_")
    inp = os.path.join(work, "transcripts")
    gen_input(inp, n_turns)

    r_small = trial(small, inp, os.path.join(work, f"out{small}"))
    r_big = trial(big, inp, os.path.join(work, f"out{big}"))
    ratio = big / small
    eff = (r_big["turns_per_sec"] / r_small["turns_per_sec"]) / ratio
    print(json.dumps({
        "n_turns": n_turns,
        "small": r_small,
        "big": r_big,
        "speedup": round(r_big["turns_per_sec"] / r_small["turns_per_sec"], 2),
        "core_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
        "workdir": work,
    }))


if __name__ == "__main__":
    main()
