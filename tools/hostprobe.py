"""Host-contention probe (box-noise protocol, BASELINE.md).

This sandbox VM suffers intermittent host-level vCPU starvation that the
guest cannot observe as steal time: identical Spark runs measure 2-10x
apart. The documented protocol before any precision benchmark: run a pure-
Python CPU burn at 1 and 4 processes; parallel efficiency >= ~0.85 means a
clean window, <= ~0.76 means contended (postpone precision runs or weight
the best-of-N floor accordingly).

Usage: python tools/hostprobe.py  -> one JSON line
Library: probe() -> {"t1": s, "t4": s, "efficiency": e, "clean": bool}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

BURN_N = 3_000_000
CLEAN_FLOOR = 0.85


def _burn(n: int = BURN_N) -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(n):
        x += i * i
    return time.perf_counter() - t0


def _burn_q(q, n):
    q.put(_burn(n))


def probe(procs: int = 4, n: int = BURN_N) -> dict:
    _burn(n // 10)  # warm the interpreter/allocator
    t1 = min(_burn(n) for _ in range(2))
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    ps = [ctx.Process(target=_burn_q, args=(q, n)) for _ in range(procs)]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    walls = [q.get() for _ in ps]
    for p in ps:
        p.join()
    elapsed = time.perf_counter() - t0
    # efficiency = serial time / slowest parallel worker (ideal 1.0 on
    # >=procs idle cores); elapsed covers fork overhead as a sanity bound
    eff = t1 / max(walls)
    return {
        "t1": round(t1, 3),
        "t_parallel_max": round(max(walls), 3),
        "elapsed": round(elapsed, 3),
        "procs": procs,
        "efficiency": round(eff, 3),
        "clean": eff >= CLEAN_FLOOR,
    }


if __name__ == "__main__":
    print(json.dumps(probe()))
