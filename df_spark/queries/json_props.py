"""Semi-structured data: the events ``props`` column is a JSON string —
parse it JVM-side (``get_json_object`` / ``from_json``) and aggregate
on extracted fields. DuckDB twins use its JSON operators.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import load_sdf
from . import register


@register(
    "json_extract",
    sql="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
           event_type
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 90
    """,
)
def json_extract(spark, sf_dir):
    ev = load_sdf(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_id", k.alias("k_value"), "event_type")
        .filter(F.col("k_value") >= 90)
    )


@register(
    "json_agg",
    sql="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def json_agg(spark, sf_dir):
    # from_json with an explicit schema (typed struct column) — the
    # production path for known-shape JSON; get_json_object for ad-hoc
    ev = load_sdf(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = ev.withColumn("p", F.from_json("props", schema))
    return parsed.groupBy("event_type").agg(
        F.sum("p.k").alias("k_total"),
        F.max("p.k").alias("k_max"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "sql_surface",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def sql_surface(spark, sf_dir):
    # the engine's SQL entry point: register tables, run spark.sql —
    # Catalyst produces the same plan as the DataFrame API
    load_sdf(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        WHERE o_orderstatus = 'O'
        GROUP BY o_orderpriority
        """
    )


@register(
    "variant_stats",
    sql="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
           -- json_extract_string: VARCHAR NULL for an absent key in
           -- every DuckDB version; json_extract's NULL-vs-'null' for
           -- absent keys shifted across versions (r5 driver hash-fail)
           COUNT(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                      THEN NULL ELSE 1 END) AS n_missing_key
    FROM events GROUP BY 1
    """,
)
def variant_stats(spark, sf_dir):
    """Spark 4 VariantType ingestion: ``parse_json`` converts the JSON
    string ONCE into the binary variant encoding; every subsequent
    ``variant_get`` is a typed path read on that encoding — no
    re-parsing per extraction, and at lake scale variant columns shred
    into parquet so pushdown reaches the paths. (``json_extract``-style
    string functions re-parse the full JSON per call — the right shape
    for one field, wrong for many.)

    ``try_variant_get`` on an absent path returns NULL rather than
    erroring (counted here as n_missing_key = 0 rows), pinning the
    sparse-key semantics heterogenous event streams need. Integer
    sums/min/max → hash-exact vs the oracle's JSON operators.
    """
    ev = load_sdf(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.variant_get("v", "$.k", "bigint").alias("k"),
        F.try_variant_get("v", "$.missing", "bigint").alias("m"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count("m").alias("n_missing_key"),
    )
