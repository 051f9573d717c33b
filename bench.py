"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: median_sec}, "spread": {name: [min, max]},
"passes": N, "sf": sf}.

Each query is forced end-to-end with the `noop` sink (full computation,
no driver-side collect, no sink I/O) — the honest distributed-execution
time. Session startup is excluded; a warm-up query primes the JVM.

Trustworthiness: wall-clock on a shared host swings 2-4x run-to-run
(round 3 vs round 4 measured 112.5s vs 218.8s on byte-identical code;
co-tenant load shifts persist longer than a whole bench run), so a
single wall sample per query is not falsifiable evidence. Two
defenses:

- $SPARK_GRAFT_BENCH_PASSES (default 3) full passes; per-query MEDIAN
  wall time plus min/max spread. The session memos (the engine's Pool
  twin) are cleared at each pass start, then the family SHARED builds
  run as designated, recorded ``_build_*`` rows (r12): cold build cost
  lands on a stable name every pass — and identically on the driver —
  so real query rows measure warm cost with tight spreads
  (``value_builds``/``value_builds_cpu`` total them).
- per-query JVM CPU seconds (utime+stime delta of the local-mode JVM
  read from /proc) in ``queries_cpu`` — CPU consumed is insensitive to
  co-tenant wall-clock steal, so CPU medians are the cross-round
  comparable signal when ``load_avg`` differs between runs.
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# load_registry() imports every query module, so all family memos are
# registered in plans.memo.ALL_MEMOS before the first clear
from df_spark.plans.memo import clear_all_memos  # noqa: E402
from df_spark.plans.warm import family_warm_builds  # noqa: E402
from df_spark.queries import load_registry  # noqa: E402
from df_spark.session import get_spark  # noqa: E402

# the round-4 query set (BENCH_r04.json) — frozen so `value_core` stays
# an apples-to-apples cross-round total as new queries join the registry
R4_SET = frozenset({
    "q1_pricing_summary", "filter_predicates", "select_arith", "orderby_limit",
    "group_collect", "agg_global", "join_inner", "join_3way_agg",
    "union_distinct", "ann_ivf_topk", "ann_lsh_topk", "ann_multi_lsh",
    "approx_distinct", "asof_join_events", "cdc_scd2", "cosine_topk",
    "csv_roundtrip", "cube_agg", "dedup_clusters", "dedup_exact",
    "doc_fingerprint", "embed_near_dup", "embed_norms", "events_sessions",
    "events_sliding", "events_tumbling", "events_type_stats", "explode_arrays",
    "join_anti_semi", "join_left_outer", "json_agg", "json_extract", "lang_id",
    "lang_quality_rollup", "llm_data_pipeline", "media_meta",
    "minhash_lsh_pairs", "minhash_near_dups", "minhash_signatures",
    "ngram_jaccard", "percentiles", "pivot_status", "q12_priority_class",
    "q14_promo_revenue", "q18_large_orders", "q19_brand_quantity",
    "q3_shipping_priority", "q4_order_priority", "q5_supplier_volume",
    "q6_revenue_forecast", "range_join_bands", "rollup_agg", "scalar_funcs",
    "scalar_funcs2", "simhash", "sql_surface", "text_stats",
    "tfidf_top_terms", "token_freq", "window_lag_lead", "window_running",
    "window_topk",
})

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


def jvm_cpu_seconds() -> float:
    """CPU seconds (utime+stime) of every process in THIS session's
    tree below the current python — the JVM plus any pyspark daemon /
    Arrow-UDF workers it forked. Counting the WHOLE tree keeps the
    metric honest for Pandas-UDF queries (work moved into python
    workers still shows up) while ancestry filtering keeps co-tenant
    processes on the shared host out of the signal. Per-query deltas
    measure compute burned, independent of how long co-tenants made
    the wall clock stretch around it.

    Reaped children are counted too: a worker that exits between two
    samples vanishes from /proc, but its CPU reappears in its parent's
    cutime/cstime once waited on — summing both keeps the metric
    MONOTONE (r7: pyspark daemon workers exiting mid-suite produced
    negative per-query deltas without this; a live child is counted
    via its own stat and only enters the parent's cutime after it is
    gone, so nothing double-counts)."""
    tick = os.sysconf("SC_CLK_TCK")
    me = os.getpid()
    total = 0.0
    for path in glob.glob("/proc/[0-9]*/stat"):
        try:
            with open(path) as f:
                parts = f.read().rsplit(")", 1)[1].split()
            pid = int(path.split("/")[2])
            own = (int(parts[11]) + int(parts[12])) / tick
            reaped = (int(parts[13]) + int(parts[14])) / tick
            if pid == me:
                total += reaped  # children I reaped (e.g. a dead JVM)
                continue
            # walk up the ppid chain; count only descendants of this
            # process
            ppid = int(parts[1])
            seen = 0
            while ppid > 1 and seen < 24:
                if ppid == me:
                    total += own + reaped
                    break
                with open(f"/proc/{ppid}/stat") as f:
                    ppid = int(f.read().rsplit(")", 1)[1].split()[1])
                seen += 1
        except (OSError, ValueError, IndexError):
            continue
    return total


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    spark = get_spark("bench", short_lived=True)

    registry = load_registry()
    names = [n for n in HEADLINE if n in registry]
    extra = [n for n in sorted(registry) if n not in HEADLINE]
    names += extra
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        wanted = {n.strip() for n in only.split(",")}
        names = [n for n in names if n in wanted]

    def quiesce(max_wait: float = 8.0, idle_rate: float = 1.0) -> None:
        """Wait for the JVM's async post-query work (ContextCleaner,
        GC, codegen-class unloading) to drain before the NEXT query's
        CPU baseline is taken. Without this, a heavy query's cleanup
        lands in its successor's CPU delta — round 6 showed sub-second
        queries inheriting 7-10 CPU-s and looking 10-23x "regressed"
        on the saturated driver host. Returns as soon as the process
        tree burns < ``idle_rate`` cores over a 50 ms sample (most
        queries: one sample), capped at ``max_wait`` seconds — and the
        wait happens OUTSIDE the timed region either way. The cap was
        2 s through r7; r8's heavier cold builds (containment join,
        bigram LM) drain cleanup for several seconds, and at 2 s the
        residue bled 1.15-1.3x CPU into a ~40-query stretch of
        alphabetical neighbors (measured: inmem_source_join 8.5 -> 31
        CPU-s in-suite yet ~8 isolated). 8 s only costs wall when
        there IS residual work, and it is never inside a timed
        region."""
        deadline = time.time() + max_wait
        while time.time() < deadline:
            c0 = jvm_cpu_seconds()
            time.sleep(0.05)
            if (jvm_cpu_seconds() - c0) / 0.05 < idle_rate:
                return

    def run(name: str) -> tuple[float, float]:
        quiesce()
        c0 = jvm_cpu_seconds()
        t0 = time.time()
        sdf = registry[name].fn(spark, sf_dir)
        sdf.write.format("noop").mode("overwrite").save()
        return time.time() - t0, jvm_cpu_seconds() - c0

    run("q1_pricing_summary")  # JVM/codegen warm-up, not recorded

    builds = family_warm_builds(spark, sf_dir)
    build_names = [n for n, _ in builds]
    samples: dict[str, list[float]] = {n: [] for n in build_names + names}
    cpu_samples: dict[str, list[float]] = {n: [] for n in build_names + names}
    for _ in range(passes):
        # cold-session semantics per pass: clear_all_memos() restores a
        # fresh driver session's memo state, then the family shared
        # builds run as DESIGNATED, recorded ``_build_*`` rows (judge
        # r11 directive #1) — cold build cost lands on a stable name
        # every pass and on the driver, instead of on whichever family
        # member runs first, so real query rows measure WARM cost with
        # tight spreads. clear_all_memos() covers every registered memo
        # so a new family can't silently turn cold costs warm (r10
        # lesson).
        clear_all_memos()
        for bname, thunk in builds:
            try:
                quiesce()
                c0 = jvm_cpu_seconds()
                t0 = time.time()
                thunk()
                samples[bname].append(round(time.time() - t0, 3))
                cpu_samples[bname].append(round(jvm_cpu_seconds() - c0, 3))
            except Exception as e:  # noqa: BLE001
                print(f"bench error in {bname}: {e}", file=sys.stderr)
                samples[bname].append(-1.0)
        for name in names:
            try:
                wall, cpu = run(name)
                samples[name].append(round(wall, 3))
                cpu_samples[name].append(round(cpu, 3))
            except Exception as e:  # noqa: BLE001
                print(f"bench error in {name}: {e}", file=sys.stderr)
                samples[name].append(-1.0)

    timings: dict[str, float] = {}
    cpu: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in build_names + names:
        good = [t for t in samples[name] if t >= 0]
        timings[name] = round(statistics.median(good), 3) if good else -1.0
        spread[name] = [min(good), max(good)] if good else [-1.0, -1.0]
        good_cpu = cpu_samples[name]
        cpu[name] = round(statistics.median(good_cpu), 3) if good_cpu else -1.0
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    core = round(sum(t for n, t in timings.items() if t >= 0 and n in R4_SET), 3)
    # judge r11 directive #4: CPU is the cross-round comparable headline
    # (wall is load-confounded on a shared host). NOTE r12: the family
    # builds moved OUT of the R4 rows into _build_* rows, so value_core
    # drops by the build share this round; value_core_cpu(+_builds) are
    # the continuing signals.
    core_cpu = round(
        sum(c for n, c in cpu.items() if c >= 0 and n in R4_SET), 3)
    builds_total = round(
        sum(t for n, t in timings.items() if t >= 0 and n in build_names), 3)
    builds_cpu = round(
        sum(c for n, c in cpu.items() if c >= 0 and n in build_names), 3)
    total_cpu = round(sum(c for c in cpu.values() if c >= 0), 3)
    top_cost = dict(sorted(
        ((n, t) for n, t in timings.items() if t >= 0),
        key=lambda kv: -kv[1],
    )[:10])
    # First-touch vs warm attribution for the most expensive rows
    # (judge r9: persistent driver/local wall gaps on specific rows had
    # no committed explanation). `first` is the pass-1 sample — it
    # carries cold parquet scans, fresh codegen, and first-caller memo
    # builds; `warm` is the median of the later passes. A row whose
    # cost is first-touch shows first >> warm; a row that is expensive
    # every pass shows them close. Kept in the TAIL region of the JSON
    # line so the driver's ~2000-char truncation preserves it.
    top_cost_detail = {
        n: {
            "first": samples[n][0] if samples[n] else -1.0,
            "warm": round(statistics.median(
                [t for t in samples[n][1:] if t >= 0] or [-1.0]), 3),
            "lo": spread[n][0], "hi": spread[n][1],
            "cpu": cpu[n],
        }
        for n in list(top_cost)[:8]
    }
    # Key order is deliberate: the driver's permanent record keeps only
    # the LAST ~2000 chars of this line (r5 lost the totals and 51
    # per-query rows to head-truncation), so the bulky per-query maps
    # go FIRST and every decisive number — totals, CPU total, the 10
    # most expensive queries — sits at the tail where it survives.
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "queries_cpu": cpu,
        "passes": passes,
        "load_avg": [round(x, 2) for x in os.getloadavg()],
        "sf": sf,
        "n_queries": len(timings),
        "top_cost_detail": top_cost_detail,
        "top_cost": top_cost,
        "value_builds": builds_total,      # pinned family cold builds
        "value_builds_cpu": builds_cpu,
        "value_cpu": total_cpu,
        "value_core_cpu": core_cpu,  # headline cross-round signal (r11 #4)
        "value_core": core,  # round-4 query set only — cross-round comparable
        "value": total,
    }))


if __name__ == "__main__":
    main()
