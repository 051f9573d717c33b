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
