"""Advanced operator queries: as-of join, range join, exact
percentiles, distinct counting (exact + approx). The approx query has
no SQL oracle by design (HLL sketches differ per engine) — it takes the
driver's rows-only check, demonstrating that path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.joins import asof_join, range_join
from ..sources.tables import load_sdf
from . import register


@register(
    "asof_join_events",
    sql="""
    WITH merged AS (
      SELECT user_id, event_id, ts, event_type, value,
             1 AS src, NULL AS click_val
      FROM events WHERE event_type = 'purchase'
      UNION ALL BY NAME
      SELECT user_id, NULL AS event_id, ts, event_type, NULL AS value,
             0 AS src, value AS click_val
      FROM events WHERE event_type = 'click'
    ), carried AS (
      SELECT user_id, event_id, ts, value, src,
             LAST_VALUE(click_val IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, src
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS last_click_value
      FROM merged
    )
    SELECT user_id, event_id AS purchase_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS purchase_ts_us,
           value AS purchase_value, last_click_value
    FROM carried WHERE src = 1
    """,
)
def asof_join_events(spark, sf_dir):
    # for each purchase: the value of the user's most recent click at or
    # before it (union + carry-forward window; one shuffle on user_id)
    ev = load_sdf(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(
        purchases, clicks, on="user_id", left_time="ts", right_time="ts",
        right_cols=["value"], suffix="_click",
    )
    return joined.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.col("value").alias("purchase_value"),
        F.col("value_click").alias("last_click_value"),
    )


@register(
    "range_join_bands",
    sql="""
    WITH bands(band, lo, hi) AS (
      VALUES ('low', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
             ('high', 150000.0, 100000000.0)
    )
    SELECT band, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def range_join_bands(spark, sf_dir):
    orders = load_sdf(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 50000.0), ("mid", 50000.0, 150000.0), ("high", 150000.0, 1e8)],
        "band string, lo double, hi double",
    )
    return (
        range_join(orders, bands, "o_totalprice")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
    )


@register(
    "percentiles",
    sql="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.25) AS p25,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.75) AS p75,
           MAX(o_totalprice) AS p_max
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def percentiles(spark, sf_dir):
    # exact percentiles (linear interpolation — same definition both
    # engines); percentile_approx is the sketch variant for 100 TB
    orders = load_sdf(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("p25"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("p75"),
        F.max("o_totalprice").alias("p_max"),
    )


@register("approx_distinct", sql=None)  # rows-only: HLL sketches are engine-specific
def approx_distinct(spark, sf_dir):
    # sketches only — mixing count_distinct (Expand-based rewrite) with
    # TypedImperativeAggregate sketches in one agg is pathologically
    # slow; exact distinct counts live in events_type_stats
    li = load_sdf(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(2500)).alias("approx_median_price"),
    )


@register(
    "price_histogram",
    sql="""
    SELECT CAST(FLOOR(o_totalprice / 20000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def price_histogram(spark, sf_dir):
    # equi-width histogram — one hash aggregate on a derived bucket key;
    # the 100 TB shape for distribution profiling (no sort, no window)
    orders = load_sdf(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 20000.0).cast("long")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@register(
    "dq_checks",
    sql="""
    SELECT 'orders_null_custkey' AS check_name,
           (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
             AS n_violations
    UNION ALL
    SELECT 'orders_duplicate_pk',
           (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
    UNION ALL
    SELECT 'orders_fk_customer',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'lineitem_fk_orders',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'lineitem_nonpositive_price',
           (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice <= 0)
    UNION ALL
    SELECT 'lineitem_discount_range',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_discount < 0 OR l_discount > 0.5)
    UNION ALL
    SELECT 'orders_date_range',
           (SELECT COUNT(*) FROM orders
            WHERE year(o_orderdate) < 1990 OR year(o_orderdate) > 2005)
    """,
)
def dq_checks(spark, sf_dir):
    """Data-quality constraint audit (dbt-test style): null keys,
    primary-key uniqueness, referential integrity, and domain ranges,
    one violation count per check. The pre-ingestion gate of a training
    pipeline — a nonzero row is a quarantine signal.

    Scale shape: each check is an aggregate or a LEFT-ANTI join on the
    key it audits — no check materializes violating rows, only counts;
    the FK checks shuffle once on the key (AQE broadcasts the dim side
    when it fits). The 7 one-row results union into a single plan so
    one pass schedules them all.

    All-integer output — exact by construction.
    """
    orders = load_sdf(spark, sf_dir, "orders")
    customer = load_sdf(spark, sf_dir, "customer")
    lineitem = load_sdf(spark, sf_dir, "lineitem")

    def one(name, cnt_df):
        return cnt_df.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("long").alias("n_violations"),
        )

    checks = [
        one(
            "orders_null_custkey",
            orders.filter(F.col("o_custkey").isNull()).agg(
                F.count(F.lit(1)).alias("n")
            ),
        ),
        one(
            "orders_duplicate_pk",
            orders.agg(
                (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("n")
            ),
        ),
        one(
            "orders_fk_customer",
            orders.join(
                customer,
                orders.o_custkey == customer.c_custkey,
                "left_anti",
            ).agg(F.count(F.lit(1)).alias("n")),
        ),
        one(
            "lineitem_fk_orders",
            lineitem.join(
                orders,
                lineitem.l_orderkey == orders.o_orderkey,
                "left_anti",
            ).agg(F.count(F.lit(1)).alias("n")),
        ),
        one(
            "lineitem_nonpositive_price",
            lineitem.filter(F.col("l_extendedprice") <= 0).agg(
                F.count(F.lit(1)).alias("n")
            ),
        ),
        one(
            "lineitem_discount_range",
            lineitem.filter(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5)
            ).agg(F.count(F.lit(1)).alias("n")),
        ),
        one(
            "orders_date_range",
            orders.filter(
                (F.year("o_orderdate") < 1990) | (F.year("o_orderdate") > 2005)
            ).agg(F.count(F.lit(1)).alias("n")),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@register(
    "profile_table",
    sql="""
    SELECT 'o_orderkey' AS col,
           COUNT(*) AS n_rows,
           COUNT(o_orderkey) AS n_nonnull,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
)
def profile_table(spark, sf_dir):
    """Column-profile operator (the schema-discovery pass a pipeline
    runs before writing constraints like ``dq_checks``): one row per
    profiled column with row/non-null/distinct counts and min/max.

    Plan shape: ONE scan and ONE aggregation node for all columns
    (count/min/max per column are independent agg expressions; the
    distinct counts become one Expand — Spark's standard
    multiple-count-distinct rewrite: rows × profiled-columns, then a
    single hash agg). The naive per-column UNION of scans — what the
    oracle SQL spells — reads the table K times; this reads it once.
    Min/max are rendered to strings so heterogenous column types share
    one result schema.
    """
    from pyspark.sql import functions as F

    orders = load_sdf(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.count(c).alias(f"{c}__nonnull"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = orders.agg(*aggs)
    # unpivot the single wide row into one row per column: stack() is a
    # generator over the already-aggregated scalars (no second scan)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__nonnull, {c}__distinct, {c}__min, {c}__max"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col, n_rows, n_nonnull, n_distinct, min_val, max_val)"
    )


from ..functions.hashing import zvalue_sql as _zvalue_sql  # noqa: E402

_ZY = "hour(CAST(ts AS TIMESTAMP)) * 60 + minute(CAST(ts AS TIMESTAMP))"


@register(
    "zorder_key",
    sql=f"""
    SELECT event_id,
           user_id % 4096 AS x,
           ({_ZY}) AS y,
           {_zvalue_sql("user_id % 4096", _ZY)} AS zval
    FROM events
    ORDER BY zval, event_id
    LIMIT 200
    """,
)
def zorder_key(spark, sf_dir):
    """Z-order clustering key: Morton-interleave (user_id mod 4096,
    minute-of-day) so ONE sort column clusters BOTH dimensions. This is
    the write-layout operator for 100 TB lakes — sortWithinPartitions
    on ``zval`` before the sink puts each file in a small (user, time)
    rectangle, and parquet min/max statistics then prune scans filtered
    on either column (``test_zorder_layout_bounds_both_dims`` measures
    the per-file rectangle widths against a single-key sort). The query
    pins the bit-interleave arithmetic exactly against the oracle.
    """
    from pyspark.sql import functions as F

    from ..functions.hashing import zvalue

    ev = load_sdf(spark, sf_dir, "events")
    x = (F.col("user_id") % 4096).cast("int")
    y = (F.hour("ts") * 60 + F.minute("ts")).cast("int")
    return (
        ev.select(
            "event_id",
            x.alias("x"),
            y.alias("y"),
            zvalue(x, y).alias("zval"),
        )
        .orderBy("zval", "event_id")
        .limit(200)
    )


@register(
    "sketch_rollup",
    sql="""
    SELECT event_type AS scope,
           COUNT(DISTINCT user_id) AS n_exact,
           TRUE AS hll_ok
    FROM events GROUP BY 1
    UNION ALL
    SELECT '_all', COUNT(DISTINCT user_id), TRUE FROM events
    """,
)
def sketch_rollup(spark, sf_dir):
    """Mergeable-sketch rollup — the reason sketches matter at 100 TB:
    per-partition HLL sketches (DataSketches ``hll_sketch_agg``) are
    tiny, storable, and RE-AGGREGATABLE, so the global distinct count
    comes from ``hll_union_agg`` over the per-type sketches — no second
    scan, no giant count-distinct Expand over raw data.

    Falsifiability (the ``approx_distinct`` gate pattern): each row
    carries the EXACT distinct count plus ``hll_ok`` asserting the HLL
    estimate lands within max(5, 5%) of it — ~3 sigma for the default
    lgK=12 sketch, and HLL is deterministic for fixed data, so the flag
    is stable. The oracle supplies exact counts and literal TRUE; any
    estimator drift (or a broken merge) flips a flag and hash-fails.
    The '_all' row is computed ONLY from the merged per-type sketches,
    so it specifically certifies merge correctness.
    """
    from pyspark.sql import functions as F

    ev = load_sdf(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("n_exact"),
    )
    tol = lambda n: F.greatest(F.lit(5.0), n.cast("double") * 0.05)  # noqa: E731
    per_rows = per.select(
        F.col("event_type").alias("scope"),
        "n_exact",
        (
            F.abs(F.hll_sketch_estimate("sk").cast("double") - F.col("n_exact"))
            <= tol(F.col("n_exact"))
        ).alias("hll_ok"),
    )
    merged = per.agg(F.hll_union_agg("sk").alias("sk"))
    exact_all = ev.agg(F.count_distinct("user_id").alias("n_exact"))
    all_row = merged.crossJoin(exact_all).select(
        F.lit("_all").alias("scope"),
        "n_exact",
        (
            F.abs(F.hll_sketch_estimate("sk").cast("double") - F.col("n_exact"))
            <= tol(F.col("n_exact"))
        ).alias("hll_ok"),
    )
    return per_rows.unionByName(all_row)


@register(
    "theta_segments",
    sql="""
    SELECT 'intersection' AS op,
           (SELECT COUNT(*) FROM (
              SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
              INTERSECT
              SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
           )) AS n_exact,
           TRUE AS theta_ok
    UNION ALL
    SELECT 'difference',
           (SELECT COUNT(*) FROM (
              SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
              EXCEPT
              SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
           )),
           TRUE
    UNION ALL
    SELECT 'union',
           (SELECT COUNT(DISTINCT user_id) FROM events
            WHERE event_type IN ('click', 'purchase')),
           TRUE
    """,
)
def theta_segments(spark, sf_dir):
    """Theta-sketch audience segmentation: |clickers ∩ purchasers|,
    |clickers \\ purchasers|, |clickers ∪ purchasers| estimated purely
    from two per-segment sketches — the capability HLL lacks
    (intersection/difference), and the 100 TB pattern for audience
    overlap: keep one tiny sketch per segment, answer any boolean
    combination without touching raw data.

    Same falsifiability gate as ``sketch_rollup``: each row carries the
    exact cardinality plus a flag that the sketch estimate lands within
    max(5, 5%) — theta sketches are exact below their nominal-entries
    threshold (default 4096 > the user counts at test SFs), so the
    flags are deterministically TRUE unless the sketch algebra breaks.

    Fully lazy, two scans, no driver actions: exact counts come from
    ONE per-user flag aggregate (not intersect/except set ops), the
    sketch algebra runs in a second single-row aggregate, and the two
    1-row frames cross-join and unpivot via stack() into the 3-row
    result.
    """
    from pyspark.sql import functions as F

    ev = load_sdf(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    flags = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("p"),
    )
    exact = flags.agg(
        F.sum(F.when((F.col("c") == 1) & (F.col("p") == 1), 1).otherwise(0))
        .alias("x_intersection"),
        F.sum(F.when((F.col("c") == 1) & (F.col("p") == 0), 1).otherwise(0))
        .alias("x_difference"),
        F.count(F.lit(1)).alias("x_union"),  # every row clicked or purchased
    )
    sk = (
        ev.groupBy("event_type")
        .agg(F.expr("theta_sketch_agg(user_id)").alias("sk"))
        .groupBy()
        .pivot("event_type", ["click", "purchase"])
        .agg(F.first("sk"))
        .select(
            F.expr("theta_sketch_estimate(theta_intersection(click, purchase))")
            .alias("e_intersection"),
            F.expr("theta_sketch_estimate(theta_difference(click, purchase))")
            .alias("e_difference"),
            F.expr("theta_sketch_estimate(theta_union(click, purchase))")
            .alias("e_union"),
        )
    )
    ok = (
        "abs(CAST(e_{op} AS DOUBLE) - x_{op}) <= greatest(5.0D, 0.05D * x_{op})"
    )
    return exact.crossJoin(sk).selectExpr(
        "stack(3, "
        "'intersection', x_intersection, " + ok.format(op="intersection") + ", "
        "'difference', x_difference, " + ok.format(op="difference") + ", "
        "'union', x_union, " + ok.format(op="union") + ") "
        "AS (op, n_exact, theta_ok)"
    )


@register(
    "kll_quantiles",
    sql="""
    SELECT o_orderpriority AS scope,
           COUNT(*) AS n_rows,
           quantile_cont(o_totalprice, 0.5) AS p50_exact,
           TRUE AS kll_ok
    FROM orders GROUP BY 1
    UNION ALL
    SELECT '_all', COUNT(*), quantile_cont(o_totalprice, 0.5), TRUE
    FROM orders
    """,
)
def kll_quantiles(spark, sf_dir):
    """Mergeable quantile sketches (DataSketches KLL): one sketch of
    order prices per priority class, and the GLOBAL median estimated
    from ``kll_merge_agg`` over the per-class sketches — the
    store-partials / merge-later quantile pattern (``sketch_rollup``'s
    HLL twin). A KLL sketch answers any quantile after one pass; merged
    sketches answer lake-wide quantiles without rescanning.

    Gate: each row carries the EXACT interpolated median plus kll_ok
    asserting the sketch estimate lies within the exact p45..p55 band.
    KLL compaction is randomized, so the estimate itself is not
    hash-comparable — but the band is ~30x the default k=200 sketch's
    ~1.7% rank error, so the boolean flag is stable across runs and a
    broken sketch or merge still flips it.
    """
    from pyspark.sql import functions as F

    orders = load_sdf(spark, sf_dir, "orders")
    per = orders.groupBy("o_orderpriority").agg(
        F.expr("kll_sketch_agg_double(o_totalprice)").alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50_exact"),
        F.expr("percentile(o_totalprice, 0.45)").alias("p45"),
        F.expr("percentile(o_totalprice, 0.55)").alias("p55"),
    )
    per_rows = per.select(
        F.col("o_orderpriority").alias("scope"),
        "n_rows",
        "p50_exact",
        F.expr("kll_sketch_get_quantile_double(sk, 0.5)")
        .between(F.col("p45"), F.col("p55"))
        .alias("kll_ok"),
    )
    merged = per.agg(F.expr("kll_merge_agg_double(sk)").alias("sk"))
    exact_all = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50_exact"),
        F.expr("percentile(o_totalprice, 0.45)").alias("p45"),
        F.expr("percentile(o_totalprice, 0.55)").alias("p55"),
    )
    all_row = merged.crossJoin(exact_all).select(
        F.lit("_all").alias("scope"),
        "n_rows",
        "p50_exact",
        F.expr("kll_sketch_get_quantile_double(sk, 0.5)")
        .between(F.col("p45"), F.col("p55"))
        .alias("kll_ok"),
    )
    return per_rows.unionByName(all_row)


@register(
    "bloom_semi_join",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 9000
    )
    """,
)
def bloom_semi_join_q(spark, sf_dir):
    """EXACT semi-join of orders against high-balance customers,
    bloom-prefiltered: the dim key set's 2 KB fingerprint is collected
    (bounded by construction) and injected as a LITERAL filter on the
    fact scan, killing non-member rows map-side BEFORE the exchange;
    the exact semi-join on survivors removes the bloom's false
    positives, so the oracle is the plain EXISTS semi-join. The 100 TB
    shape this demonstrates: membership filtering against a dim too
    big to broadcast as a hash relation — the fact-side shuffle
    carries only candidates (~|members| + fp x |fact|) instead of every
    row. See operators/bloom.py; test_bloom.py measures the prune and
    pins the filter-below-join plan shape."""
    from ..operators.bloom import bloom_semi_join

    orders = load_sdf(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    dim = load_sdf(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 9000).select("c_custkey")
    return bloom_semi_join(orders, "o_custkey", dim, "c_custkey")


@register(
    "grouped_zscore",
    sql="""
    WITH stats AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS s1,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
      FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source,
           round(
             (CAST(d.n_chars AS DOUBLE) - CAST(s.s1 AS DOUBLE) / s.n)
             / sqrt((CAST(s.s2 AS DOUBLE)
                     - CAST(s.s1 AS DOUBLE) * (CAST(s.s1 AS DOUBLE) / s.n))
                    / (s.n - 1)),
             6) AS z
    FROM documents d JOIN stats s USING (source)
    WHERE s.n > 1
    """,
)
def grouped_zscore(spark, sf_dir):
    """Batch GROUPED-MAP via ``applyInPandas``: per-source z-scores of
    document length, each group normalized inside one Arrow-batched
    pandas call — the canonical per-group Python transform (the
    grouped twin of the ``mapInPandas`` featurizer; Spark shuffles on
    the group key and hands each group to Python whole).

    Determinism contract: the moments come from INTEGER sums (pandas
    int64 — exact, order-free), and the float expression tree
    ``(x - s1/n) / sqrt((s2 - s1*(s1/n)) / (n-1))`` is replicated
    node-for-node in the oracle, so both engines round the identical
    doubles. 100 TB shape: one shuffle on the group key; per-task
    memory is the largest single group — for heavier groups the
    aggregate-then-broadcast-join form replaces the grouped map, which
    is exactly what the oracle SQL expresses."""
    import pandas as pd

    docs = load_sdf(spark, sf_dir, "documents")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pdf.iloc[0:0][["doc_id", "source"]].assign(z=0.0)
        x = pdf["n_chars"]
        s1 = int(x.sum())
        s2 = int((x * x).sum())
        mean = s1 / n
        var = (float(s2) - float(s1) * mean) / (n - 1)
        z = ((x.astype("float64") - mean) / (var ** 0.5)).round(6)
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "source": pdf["source"], "z": z})

    return (
        docs.select("doc_id", "source", "n_chars")
        .groupBy("source")
        .applyInPandas(zscore, schema="doc_id long, source string, z double")
    )
