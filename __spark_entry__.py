"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TPC-H Q1 pipeline (reference
``client.py:259-331``) at sf0.001. ``queries()`` / ``oracle_sql()``
expose the engine's operator inventory (SURVEY.md §2 + extensions),
each checked against DuckDB at sf0.01 by the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from df_spark.queries import load_registry


def _configure(spark: SparkSession) -> None:
    """Session configs the engine needs (normally set by
    ``df_spark.session.get_spark``; the driver builds its own session).
    Each conf is set independently — one unavailable key (e.g. a build
    without the legacy-nanos flag) must not skip the others."""
    for key, val in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
    ):
        try:
            spark.conf.set(key, val)
        except Exception:  # noqa: BLE001 — per-key: others still apply
            pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _configure(spark)
    registry = load_registry()
    return registry["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry = load_registry()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(q.fn) for name, q in registry.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible ops → driver does a rows-only check)."""
    registry = load_registry()
    return {name: q.sql for name, q in registry.items() if q.sql is not None}
