"""Loaders for the driver's synthetic TPC-H-ish tables (TESTDATA.md).

Normalizations applied at scan time (cheap, column-level, pushdown-safe):
- ``events.ts`` is parquet TIMESTAMP(NANOS) which Spark cannot represent
  (µs max). With ``spark.sql.legacy.parquet.nanosAsLong`` the column
  arrives as a nanosecond long; we truncate to µs with integer division
  (``div`` — stays in long space, no double round-trip) and convert via
  ``timestamp_micros``. DuckDB's ``CAST(ts AS TIMESTAMP)`` truncates the
  same way, so oracle comparisons line up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..frame import Df
from ..plans.fingerprint import fingerprint_op, fingerprint_source

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_sdf(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    sdf = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(sdf.dtypes).get("ts") == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return sdf


def load_table(spark: SparkSession, sf_dir: str, name: str) -> Df:
    # content-addressed fingerprint (path+mtime, plus the ts normalization
    # step) so a rebuilt plan over the same table hits the PlanCache
    path = f"{sf_dir}/{name}.parquet"
    fp = fingerprint_source("parquet", path)
    if name == "events":
        fp = fingerprint_op(fp, "events_ts_ns_to_micros")
    return Df(load_sdf(spark, sf_dir, name), fingerprint=fp)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, Df]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
