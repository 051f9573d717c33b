"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.

Each query is forced end-to-end with the `noop` sink (full computation,
no driver-side collect, no sink I/O) — the honest distributed-execution
time. Session startup is excluded; a warm-up query primes the JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from df_spark.queries import load_registry  # noqa: E402
from df_spark.session import get_spark  # noqa: E402

# flagship + one per operator family; extensions are added as they land
HEADLINE = [
    "q1_pricing_summary",
    "filter_predicates",
    "select_arith",
    "orderby_limit",
    "group_collect",
    "agg_global",
    "join_inner",
    "join_3way_agg",
    "union_distinct",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    spark = get_spark("bench")

    registry = load_registry()
    names = [n for n in HEADLINE if n in registry]
    extra = [n for n in sorted(registry) if n not in HEADLINE]
    names += extra

    def run(name: str) -> float:
        t0 = time.time()
        sdf = registry[name].fn(spark, sf_dir)
        sdf.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run("q1_pricing_summary")  # JVM/codegen warm-up, not recorded

    timings: dict[str, float] = {}
    for name in names:
        try:
            timings[name] = round(run(name), 3)
        except Exception as e:  # noqa: BLE001
            print(f"bench error in {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
