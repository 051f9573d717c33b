"""Per-query timing with repeats: runs named registry queries N times
each in one warm session (noop sink, same harness as bench.py) and
prints min/median/max so regressions can be separated from noise.

Usage: python tools/time_queries.py [--sf DIR] [--n N] query [query ...]
       python tools/time_queries.py --all
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from df_spark.queries import load_registry  # noqa: E402
from df_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    spark = get_spark("time_queries", short_lived=True)
    registry = load_registry()
    names = sorted(registry) if args.all else args.queries
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    def run(name: str) -> float:
        t0 = time.time()
        registry[name].fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm-up on a neutral query (not the ones under measurement, so
    # operator-level memos aren't pre-populated by the warm-up)
    run("q1_pricing_summary" if "q1_pricing_summary" in registry else names[0])

    out = {}
    for name in names:
        ts = [round(run(name), 3) for _ in range(args.n)]
        out[name] = {
            "runs": ts,
            "min": min(ts),
            "median": round(statistics.median(ts), 3),
            "max": max(ts),
        }
        print(f"{name}: median={out[name]['median']}s runs={ts}", flush=True)
    print(json.dumps({"sf": args.sf, "n": args.n, "timings": out}))


if __name__ == "__main__":
    main()
