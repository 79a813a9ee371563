"""Compare two bench.py JSON outputs (or any BENCH_r*.json) per query.

Usage: python tools/compare_bench.py OLD.json NEW.json [--fail-over RATIO]

Prints one line per query present in either file: old s, new s, ratio
(new/old), and the probe-clean flags when recorded. With ``--fail-over R``
exits 1 if any query present in both files regressed past R in a window
BOTH sides flagged clean (contended-window swings are expected and don't
gate). The totals are NOT compared — headline sets grow across rounds;
per-query times are the cross-round signal (BASELINE.md convention).
"""

from __future__ import annotations

import json
import sys


def main(argv: list[str]) -> int:
    fail_over = None
    if "--fail-over" in argv:
        i = argv.index("--fail-over")
        fail_over = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    old_p, new_p = argv[0], argv[1]

    def load(p):
        d = json.load(open(p))
        # driver BENCH_r*.json wraps the bench line under "parsed"
        return d.get("parsed", d)

    old, new = load(old_p), load(new_p)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    op, np_ = old.get("query_probes", {}), new.get("query_probes", {})
    names = sorted(set(oq) | set(nq))
    width = max((len(n) for n in names), default=0)
    if fail_over and (not op or not np_):
        # without per-query probe flags the clean-window condition below
        # can never hold, so the gate would silently pass everything
        print(
            "warning: --fail-over set but "
            f"{'both files lack' if not op and not np_ else (old_p if not op else new_p) + ' lacks'} "
            "query_probes — the regression gate is INACTIVE",
            file=sys.stderr,
        )
    bad = []
    for n in names:
        o, x = oq.get(n), nq.get(n)
        oc = op.get(n, {}).get("clean")
        nc = np_.get(n, {}).get("clean")
        flag = f"{'c' if oc else '-'}{'c' if nc else '-'}"
        if o is None:
            print(f"{n:<{width}}  {'NEW':>9}  {x:>8.3f}s  {'':>6}  [{flag}]")
        elif x is None:
            print(f"{n:<{width}}  {o:>8.3f}s  {'DROPPED':>9}  {'':>6}  [{flag}]")
        else:
            r = x / o if o else float("inf")
            mark = ""
            if fail_over and r > fail_over and oc and nc:
                mark = "  REGRESSION"
                bad.append(n)
            print(f"{n:<{width}}  {o:>8.3f}s  {x:>8.3f}s  {r:>5.2f}x  "
                  f"[{flag}]{mark}")
    if bad:
        print(f"\nclean-window regressions past {fail_over}x: {bad}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
