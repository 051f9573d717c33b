"""Semantics pins for the analytics-surface extensions (full-outer
join, set ops, salted join, cohort retention, BM25): properties the
oracle hash alone wouldn't explain if they regressed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from df_spark.queries import load_registry

REGISTRY = load_registry()


def test_full_outer_has_both_null_sides(spark, sf_dir):
    out = REGISTRY["join_full_outer"].fn(spark, sf_dir)
    left_only = out.filter(F.col("name").isNull()).count()
    right_only = out.filter(F.col("n_orders").isNull()).count()
    assert left_only > 0, "expected ordering customers outside the debtor filter"
    assert right_only > 0, "expected debtors with no orders"
    # custkey is the coalesced key: never null, never duplicated
    assert out.filter(F.col("custkey").isNull()).count() == 0
    assert out.select("custkey").distinct().count() == out.count()


def test_set_ops_segments_partition_the_union(spark, sf_dir):
    out = REGISTRY["set_ops"].fn(spark, sf_dir).collect()
    seen: dict[int, str] = {}
    for r in out:
        assert r.custkey not in seen, (
            f"custkey {r.custkey} in both {seen[r.custkey]} and {r.segment}"
        )
        seen[r.custkey] = r.segment
    segments = {r.segment for r in out}
    assert segments == {"both", "only_1995", "only_1996"}


def test_salted_join_matches_plain_join(spark, sf_dir):
    salted = {
        (r.priority, r.n_lines, round(r.revenue, 2))
        for r in REGISTRY["skew_salted_join"].fn(spark, sf_dir).collect()
    }
    from df_spark.sources.tables import load_sdf

    plain = {
        (r.priority, r.n_lines, round(r.revenue, 2))
        for r in (
            load_sdf(spark, sf_dir, "lineitem")
            .join(
                load_sdf(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("revenue"),
            )
            .collect()
        )
    }
    assert salted == plain


def test_cohort_retention_week_zero_dominates(spark, sf_dir):
    rows = REGISTRY["cohort_retention"].fn(spark, sf_dir).collect()
    assert all(r.week_offset >= 0 for r in rows)
    # a user's cohort week always contains their first event, so every
    # cohort must have a week-0 row, and cohort user counts at offset 0
    # are >= any later offset of the same cohort
    by_cohort: dict[str, dict[int, int]] = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_day, {})[r.week_offset] = r.n_users
    for cohort, offs in by_cohort.items():
        assert 0 in offs, f"cohort {cohort} missing week 0"
        assert offs[0] == max(offs.values()), (
            f"cohort {cohort}: week 0 should have every cohort member active"
        )


def test_bm25_rare_term_outranks_common(spark, sf_dir):
    """Docs containing the rare term ('dup', df~5%) should fill the top
    ranks ahead of docs with only common terms — the defining IDF
    property."""
    from df_spark.queries.analytics import _BM25_TOPK

    out = REGISTRY["bm25_rank"].fn(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == _BM25_TOPK
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
        range(1, _BM25_TOPK + 1)
    )
    assert all(r.score > 0 for r in rows)

    from df_spark.functions.text import normalized
    from df_spark.sources.tables import load_sdf

    docs = load_sdf(spark, sf_dir, "documents").select(
        "doc_id", normalized(F.col("text")).alias("t")
    )
    dup_docs = {
        r.doc_id
        for r in docs.filter(
            F.array_contains(F.split("t", " "), "dup")
        ).collect()
    }
    top5 = [r.doc_id for r in sorted(rows, key=lambda r: r.rank)[:5]]
    assert any(d in dup_docs for d in top5), (
        "no rare-term doc in the top 5 — IDF weighting broken"
    )


def test_events_anomaly_integer_exact_flagging(spark):
    """The 3-sigma test on a constructed series: 23 calm hours at ~10
    events and one 100-event spike — only the spike is flagged, and the
    integer inequality matches the float z-score definition."""
    from df_spark.sources.tables import load_sdf  # noqa: F401 (style parity)

    counts = [10, 11, 9, 10, 10, 12, 8, 10, 11, 9, 10, 10,
              10, 9, 11, 10, 12, 8, 10, 10, 11, 9, 10, 100]
    n = len(counts)
    s = sum(counts)
    q = sum(c * c for c in counts)
    import statistics
    mean = s / n
    sigma = (q / n - mean * mean) ** 0.5
    flagged_float = [c for c in counts if c > mean and (c - mean) > 3 * sigma]
    flagged_int = [c for c in counts
                   if c * n - s > 0 and (c * n - s) ** 2 > 9 * (n * q - s * s)]
    assert flagged_int == flagged_float == [100]


def test_shard_assign_stable_and_complete(spark, sf_dir):
    """Content-hash sharding: every doc lands in [0, 32), totals add up,
    and assignment is independent of input order (re-run on a shuffled
    frame produces identical shard histograms)."""
    from df_spark.queries import load_registry

    reg = load_registry()
    rows = {r.shard: (r.n_docs, r.total_chars)
            for r in reg["shard_assign"].fn(spark, sf_dir).collect()}
    assert set(rows) <= set(range(32))
    from df_spark.sources.tables import load_sdf
    docs = load_sdf(spark, sf_dir, "documents")
    assert sum(n for n, _ in rows.values()) == docs.count()
    rows2 = {r.shard: (r.n_docs, r.total_chars)
             for r in reg["shard_assign"].fn(spark, sf_dir).collect()}
    assert rows == rows2


def test_mv_incremental_any_split_equals_recompute(spark, sf_dir):
    """Incremental refresh is split-invariant: merging the base MV with
    ANY delta partitioning of the events yields the same MV as a full
    recompute (the registry query proves the mod-10 split against
    DuckDB; this pins two other splits)."""
    from pyspark.sql import functions as F

    from df_spark.sources.tables import load_sdf

    ev = load_sdf(spark, sf_dir, "events")

    def rollup(df):
        return df.groupBy(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("tv"),
        )

    full = {(r.event_type, r.day): (r.n, str(r.tv)) for r in rollup(ev).collect()}

    for pred in [F.col("event_id") % 3 == 0, F.col("user_id") % 7 == 0]:
        base = rollup(ev.filter(~pred)).alias("m")
        delta = rollup(ev.filter(pred)).alias("d")
        merged = base.join(delta, ["event_type", "day"], "full_outer").select(
            "event_type", "day",
            (F.coalesce(F.col("m.n"), F.lit(0)) + F.coalesce(F.col("d.n"), F.lit(0))).alias("n"),
            (F.coalesce(F.col("m.tv"), F.lit(0).cast("decimal(18,2)"))
             + F.coalesce(F.col("d.tv"), F.lit(0).cast("decimal(18,2)"))).alias("tv"),
        )
        got = {(r.event_type, r.day): (r.n, str(r.tv)) for r in merged.collect()}
        assert got == full


def test_events_gapfill_grid_dense_and_carry(spark, sf_dir):
    """Gap-fill invariants: the output is the FULL dense hour x type
    grid (|hours| x |types| rows exactly), zero-count buckets exist and
    carry the last observed average forward, and observed buckets agree
    with a direct aggregate."""
    from pyspark.sql import functions as F

    from df_spark.queries import load_registry
    from df_spark.sources.tables import load_sdf

    rows = load_registry()["events_gapfill"].fn(spark, sf_dir).collect()
    ev = load_sdf(spark, sf_dir, "events")
    n_types = ev.select("event_type").distinct().count()
    lo, hi = ev.agg(
        F.min(F.floor(F.unix_micros("ts") / F.lit(3_600_000_000))),
        F.max(F.floor(F.unix_micros("ts") / F.lit(3_600_000_000))),
    ).collect()[0]
    assert len(rows) == (hi - lo + 1) * n_types

    by_type = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.hour_bucket)):
        by_type.setdefault(r.event_type, []).append(r)
    filled_gap_seen = False
    for series in by_type.values():
        last_avg = None
        for r in series:
            if r.n_events == 0:
                # carried value == previous non-gap average
                if last_avg is not None:
                    assert r.carried_avg == last_avg
                    filled_gap_seen = True
            else:
                last_avg = r.carried_avg
    assert filled_gap_seen, "fixture has no gaps — test data assumption broken"


def test_events_funnel_counts_monotone(spark, sf_dir):
    """Ordered funnel: each successive stage's user count can never
    exceed the previous stage's (a user must pass stage k before k+1)."""
    from df_spark.queries import load_registry

    rows = load_registry()["events_funnel"].fn(spark, sf_dir).collect()
    assert rows
    cols = rows[0].asDict()
    stage_cols = [c for c in cols if c.startswith("n_")]
    if len(rows) > 1 and not stage_cols:
        counts = [r[-1] for r in sorted(rows, key=lambda r: r[0])]
        assert all(a >= b for a, b in zip(counts, counts[1:]))
    elif stage_cols:
        for r in rows:
            vals = [r[c] for c in stage_cols]
            assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_quality_deciles_partition_sizes(spark, sf_dir):
    """NTILE(10) per language: decile bucket sizes within a language
    differ by at most one document (the defining NTILE property)."""
    from df_spark.queries import load_registry

    rows = load_registry()["quality_deciles"].fn(spark, sf_dir).collect()
    assert rows
    sizes: dict[tuple, int] = {}
    for r in rows:  # one row per doc: (doc_id, lang, decile)
        sizes[(r.lang, r.decile)] = sizes.get((r.lang, r.decile), 0) + 1
    langs = {lang for lang, _ in sizes}
    for lang in langs:
        buckets = [n for (lg, _), n in sizes.items() if lg == lang]
        assert max(buckets) - min(buckets) <= 1, (lang, buckets)
        assert len(buckets) == min(10, sum(buckets))  # 10 deciles unless tiny


def test_pack_sequences_layout_invariants(spark, sf_dir):
    """Packing invariants per shard (lang): offsets start at 0, each
    doc's offset is the previous doc's offset + token count (dense, no
    holes, no overlap), and bin_id is the 2048-token bin of the doc's
    first token."""
    from df_spark.queries import load_registry

    rows = load_registry()["pack_sequences"].fn(spark, sf_dir).collect()
    assert rows
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for series in by_lang.values():
        series.sort(key=lambda r: r.doc_id)
        expect = 0
        for r in series:
            assert r.token_offset == expect
            assert r.bin_id == r.token_offset // 2048
            expect += r.n_tokens


def test_interval_overlap_counts_positive_and_ranked(spark, sf_dir):
    from df_spark.queries import load_registry

    rows = load_registry()["interval_overlap_join"].fn(spark, sf_dir).collect()
    assert rows
    assert len({r.custkey for r in rows}) == len(rows)
    counts = [r.n_overlaps for r in rows]
    assert all(c >= 1 for c in counts)
    assert counts == sorted(counts, reverse=True)


def test_events_regression_exact_moments(spark, sf_dir):
    from df_spark.queries import load_registry
    from df_spark.sources.tables import load_sdf
    from pyspark.sql import functions as F

    rows = load_registry()["events_regression"].fn(spark, sf_dir).collect()
    n_events = load_sdf(spark, sf_dir, "events").count()
    assert sum(r.n for r in rows) == n_events
    for r in rows:
        # den = n*Sxx - Sx^2 is n^2 * variance(x) -- strictly positive
        # whenever x isn't constant within the group
        assert r.slope_den > 0
        assert r.slope_centi_per_hour == r.slope_num / r.slope_den


def test_array_hof_bounds(spark, sf_dir):
    from df_spark.queries import load_registry

    rows = load_registry()["array_hof"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.dim == 64
        assert 0 <= r.n_pos <= r.dim
        assert r.min_milli <= r.max_milli
        assert r.dim * r.min_milli <= r.checksum <= r.dim * r.max_milli


def test_nullsafe_join_keeps_the_null_partition(spark, sf_dir):
    from df_spark.queries import load_registry
    from df_spark.sources.tables import load_sdf

    rows = load_registry()["nullsafe_join"].fn(spark, sf_dir).collect()
    labels = {r.grp_label for r in rows}
    assert "null" in labels  # the partition a plain equi-join drops
    n_orders = load_sdf(spark, sf_dir, "orders").count()
    assert sum(r.n for r in rows) == n_orders
