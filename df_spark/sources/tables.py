"""Loaders for the driver's synthetic TPC-H-ish tables (TESTDATA.md).

Normalizations applied at scan time (cheap, column-level, pushdown-safe):
- timestamp columns (``events.ts``, ``orders.o_orderdate``,
  ``lineitem.l_shipdate``) are parquet TIMESTAMP_MICROS with
  ``isAdjustedToUTC=0``, which Spark 4 infers as TIMESTAMP_NTZ by
  default — a type many chrono builtins (``unix_micros``, ``window``)
  reject. ``load_sdf`` disables ``spark.sql.parquet.inferTimestampNTZ``
  on the session (runtime SQL conf, works on driver-provided sessions
  too) so the stored micros load as TimestampType instants; with the
  UTC session timezone they line up exactly with DuckDB's naive
  TIMESTAMP reading of the same files, and ts predicates still push
  into the parquet scan. If the conf is unavailable and a column still
  arrives NTZ, a cast-to-timestamp fallback keeps semantics (at the
  cost of pushdown on that column).
- older testdata generations wrote ``events.ts`` as TIMESTAMP(NANOS);
  with ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a
  nanosecond long and is truncated to µs via ``timestamp_micros``
  (DuckDB's ``CAST(ts AS TIMESTAMP)`` truncates the same way).
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
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:  # noqa: BLE001 — conf missing on some builds; cast below
        pass
    sdf = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(sdf.dtypes).get("ts") == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    for col, dtype in sdf.dtypes:
        if dtype == "timestamp_ntz":
            sdf = sdf.withColumn(col, F.col(col).cast("timestamp"))
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
