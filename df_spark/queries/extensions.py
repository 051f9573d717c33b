"""Extension queries beyond the reference surface (SURVEY §7 Phase 3):
window functions, running aggregates, scalar function library,
cube/rollup grouping sets, pivot. Each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.windows import top_k_per_group, with_running_agg
from ..sources.tables import load_sdf, load_table
from . import register


@register(
    "window_topk",
    sql="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def window_topk(spark, sf_dir):
    # single window + rn<=k filter: Catalyst's WindowGroupLimit rewrite
    # pre-limits per input partition before the exchange, so the
    # 5-value partition key never funnels the full table into 5 tasks
    orders = load_table(spark, sf_dir, "orders")
    return (
        top_k_per_group(
            orders,
            ["o_orderpriority"],
            [("o_totalprice", False), ("o_orderkey", True)],
            k=3,
        )
        .to_spark()
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_running",
    sql="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS running_total,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
)
def window_running(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    df = with_running_agg(
        orders,
        ["o_custkey"],
        ["o_orderdate", "o_orderkey"],
        F.col("o_totalprice").cast("decimal(18,2)"),
        out="running_total",
    )
    return (
        df.to_spark()
        .withColumn("order_seq", F.row_number().over(w))
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("running_total").cast("double").alias("running_total"),
            "order_seq",
        )
    )


@register(
    "window_lag_lead",
    sql="""
    SELECT o_custkey, o_orderkey,
           LAG(o_orderkey, 1) OVER w AS prev_order,
           LEAD(o_orderkey, 1) OVER w AS next_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark, sf_dir):
    orders = load_sdf(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey", 1).over(w).alias("prev_order"),
        F.lead("o_orderkey", 1).over(w).alias("next_order"),
    )


@register(
    "scalar_funcs",
    sql="""
    SELECT o_orderkey,
           upper(o_orderpriority) AS pri_upper,
           length(o_orderpriority) AS pri_len,
           substr(o_orderpriority, 1, 1) AS pri_code,
           strftime(o_orderdate, '%Y-%m') AS order_month,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           round(o_totalprice / 1000.0, 1) AS price_k,
           abs(o_totalprice - 100000.0) AS price_dist,
           concat(o_orderstatus, '/', o_orderpriority) AS status_pri
    FROM orders
    """,
)
def scalar_funcs(spark, sf_dir):
    # string/date/math scalar library — absent from the reference
    # (SURVEY §2: arithmetic only); all JVM-side built-ins
    orders = load_sdf(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("pri_upper"),
        F.length("o_orderpriority").cast("long").alias("pri_len"),
        F.substring("o_orderpriority", 1, 1).alias("pri_code"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.round(F.col("o_totalprice") / 1000.0, 1).alias("price_k"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("price_dist"),
        F.concat_ws("/", "o_orderstatus", "o_orderpriority").alias("status_pri"),
    )


@register(
    "scalar_funcs2",
    sql="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_day,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow, -- duckdb 0=Sun; spark 1=Sun
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
           lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS padded_key,
           reverse(o_orderpriority) AS pri_rev,
           replace(o_orderpriority, '-', '_') AS pri_snake,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'med'
                ELSE 'small' END AS size_class
    FROM orders
    """,
)
def scalar_funcs2(spark, sf_dir):
    # date arithmetic, null handling, string library round 2 — all
    # codegen'd builtins
    orders = load_sdf(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("due_day"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_95"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias("status_label"),
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0").alias("padded_key"),
        F.reverse("o_orderpriority").alias("pri_rev"),
        F.replace("o_orderpriority", F.lit("-"), F.lit("_")).alias("pri_snake"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "med")
        .otherwise("small")
        .alias("size_class"),
    )


@register(
    "rollup_agg",
    sql="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_agg(spark, sf_dir):
    orders = load_sdf(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "explode_arrays",
    sql="""
    WITH t AS (
      SELECT doc_id, string_split(source, 'c') AS parts FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, CAST(i AS BIGINT) - 1 AS pos, parts[CAST(i AS INT)] AS part
    FROM t, unnest(generate_series(1, len(parts))) AS g(i)
    """,
)
def explode_arrays(spark, sf_dir):
    # array construction + positional explode (lateral view)
    docs = load_sdf(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id",
        F.posexplode(F.split("source", "c")).alias("pos", "part"),
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "part")


@register(
    "cube_agg",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_agg(spark, sf_dir):
    # grouping sets / cube — multi-dimensional rollup in one pass
    # (partial aggregation per grouping set, single shuffle)
    orders = load_sdf(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "pivot_status",
    sql="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status(spark, sf_dir):
    orders = load_sdf(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
    )


@register(
    "array_hof",
    sql="""
    SELECT vec_id,
           len(embedding)::BIGINT AS dim,
           len(list_filter(embedding, x -> x > 0))::BIGINT AS n_pos,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(floor(x * 1000) AS BIGINT))) AS BIGINT) AS checksum,
           list_max(list_transform(embedding,
                x -> CAST(floor(x * 1000) AS BIGINT))) AS max_milli,
           list_min(list_transform(embedding,
                x -> CAST(floor(x * 1000) AS BIGINT))) AS min_milli
    FROM embeddings
    """,
)
def array_hof(spark, sf_dir):
    """Higher-order array-function surface (transform / filter /
    aggregate lambdas) over the embedding column — the JVM-side array
    toolkit that keeps vector feature engineering out of Python UDFs.
    Elements are integerized with an explicit floor (truncation and
    rounding casts disagree across engines; floor doesn't), so every
    output is associative integer math the oracle hashes exactly.

    Scale: map-only over the vector column — no shuffle, no Python;
    at 100 TB this is scan-speed feature extraction."""
    emb = load_sdf(spark, sf_dir, "embeddings")
    milli = F.transform(
        F.col("embedding"), lambda x: F.floor(x * 1000).cast("long")
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("long").alias("n_pos"),
        F.aggregate(
            milli, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("checksum"),
        F.array_max(milli).alias("max_milli"),
        F.array_min(milli).alias("min_milli"),
    )


@register(
    "window_distribution",
    sql="""
    SELECT o_orderkey,
           o_orderpriority,
           RANK() OVER w AS rnk,
           CASE WHEN COUNT(*) OVER (PARTITION BY o_orderpriority) > 1
                THEN (RANK() OVER w - 1)
                     / CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) - 1
                            AS DOUBLE)
                ELSE 0.0 END AS pct_rank,
           CAST(COUNT(*) OVER
                (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             / CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS DOUBLE)
             AS cume,
           NTILE(10) OVER w AS decile
    FROM orders
    WHERE o_orderkey % 97 = 0
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution(spark, sf_dir):
    """Distribution window functions — percent_rank / cume_dist /
    ntile over (priority, price). Both sides spell percent_rank and
    cume_dist from RANK and windowed COUNTs ((rank-1)/(n-1), and a
    RANGE-framed running count over the same fully-deterministic
    (price, key) ordering), so each output is ONE double division of
    two exact integers — bit-identical across engines, no reliance on
    either engine's native percent_rank tie convention.

    Scale: one shuffle on the partition key; all four functions share
    a single sort within the window partition."""
    orders = load_sdf(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 97 == 0
    )
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wcount = Window.partitionBy("o_orderpriority")
    wrange = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.count(F.lit(1)).over(wcount)
    rnk = F.rank().over(w)
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        rnk.alias("rnk"),
        # singleton-partition guard: (n-1)=0 would raise under ANSI
        # mode (and diverge from the oracle); SQL defines pct_rank of a
        # 1-row partition as 0
        F.when(n > 1, (rnk - 1) / (n - 1).cast("double"))
        .otherwise(F.lit(0.0))
        .alias("pct_rank"),
        (F.count(F.lit(1)).over(wrange).cast("long") / n.cast("double")).alias(
            "cume"
        ),
        F.ntile(10).over(w).alias("decile"),
    )


@register(
    "unpivot_metrics",
    sql="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS qty_centi,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS disc_centi
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, metric, value FROM (
      SELECT l_returnflag, 'n_lines' AS metric, n_lines AS value FROM m
      UNION ALL
      SELECT l_returnflag, 'qty_centi', qty_centi FROM m
      UNION ALL
      SELECT l_returnflag, 'disc_centi', disc_centi FROM m
    )
    """,
)
def unpivot_metrics(spark, sf_dir):
    """Wide-to-long UNPIVOT (the inverse of ``pivot_status``): a
    3-metric aggregate melted into (key, metric, value) rows via the
    native ``DataFrame.unpivot`` (compiles to one Expand — a single
    pass, no self-union rescans; the oracle's UNION ALL spelling reads
    the tiny aggregate CTE three times, which is fine for an oracle
    and wrong at scale). Metrics are integerized (cents) so one LONG
    value column types all three without float coercion.

    Scale: the Expand triples only the AGGREGATED rows (|flags| × 3),
    never the fact table."""
    li = load_sdf(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_lines"),
        (F.sum(F.col("l_quantity").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("qty_centi"),
        (F.sum(F.col("l_discount").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("disc_centi"),
    )
    return m.unpivot(
        ["l_returnflag"],
        ["n_lines", "qty_centi", "disc_centi"],
        "metric",
        "value",
    )
