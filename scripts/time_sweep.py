"""Per-query wall-clock sweep with the noop sink (guide §1.4).

Times every registered query (or a subset) at a given SF with
`df.write.format("noop")` so the computation, not the collect/sink, is
measured; brackets each run with /proc/stat steal like bench.py.

Usage:
    python scripts/time_sweep.py [--sf DIR] [--runs 2] [--only n1 n2 ...]
    python scripts/time_sweep.py --json /tmp/sweep.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_1_20_spark import get_spark
from flink_1_20_spark.registry import get_queries


def _ticks() -> tuple[int, int]:
    try:
        with open("/proc/stat") as f:
            p = f.readline().split()
        return int(p[1]), int(p[8])
    except (OSError, IndexError, ValueError):
        return 0, 0


def _steal(b, a) -> float:
    du, ds = a[0] - b[0], a[1] - b[1]
    return ds / max(1, du + ds)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--prefix", default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    spark = get_spark("time-sweep")
    queries = get_queries()
    names = args.only or list(queries)
    if args.prefix:
        names = [n for n in names if n.startswith(args.prefix)]

    out = {}
    for name in names:
        best, best_steal, err = float("inf"), 1.0, None
        for _ in range(args.runs):
            b = _ticks()
            t0 = time.time()
            try:
                spark.sparkContext.setJobDescription(f"sweep:{name}")
                df = queries[name](spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
            except Exception:
                err = traceback.format_exc(limit=3)
                break
            dt = time.time() - t0
            s = _steal(b, _ticks())
            if dt < best:
                best, best_steal = dt, s
        if err:
            print(f"ERROR {name}\n{err}")
            out[name] = {"err": True}
        else:
            out[name] = {"sec": round(best, 3), "steal": round(best_steal, 3)}
            print(f"{best:8.3f}s  steal={best_steal:.2f}  {name}", flush=True)

    ranked = sorted(
        ((v.get("sec", -1), k) for k, v in out.items()), reverse=True
    )
    print("\n=== slowest 25 ===")
    for sec, k in ranked[:25]:
        print(f"{sec:8.3f}s  {k}")
    print(f"total={sum(v.get('sec', 0) for v in out.values()):.1f}s over {len(out)} queries")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
