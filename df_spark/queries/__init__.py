"""Query registry — the driver contract's backing store.

Each named query has a Spark implementation ``fn(spark, sf_dir) ->
DataFrame`` and (when SQL-expressible) a DuckDB oracle SQL string over
the same parquet tables. ``__spark_entry__.py`` re-exports this
registry.

Determinism policy for oracle matching (column names are aliased
identically on both sides; the driver compares order-insensitively):

- per-row double arithmetic is IEEE-deterministic → safe as-is, as
  long as both sides use the same expression tree.
- SUM/AVG over doubles is summation-order-dependent → money-like
  columns are cast to DECIMAL before summing (exact, associative),
  then the result is cast back to DOUBLE. Both engines round
  decimal→double to nearest, so results are bit-identical.
- timestamps in output are formatted to strings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None


REGISTRY: dict[str, Query] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        REGISTRY[name] = Query(name, fn, sql)
        return fn

    return deco


def load_registry() -> dict[str, Query]:
    # import for side effect of registration
    from . import core  # noqa: F401

    # Neutral ordering: modules imported alphabetically and the final
    # registry sorted by query name, so any sampler that takes a prefix
    # covers queries uniformly rather than by registration order.
    for mod in ("advanced", "cdc_q", "dedup", "events", "extensions",
                "json_props", "multimodal", "pipeline_q", "sampling_q",
                "similarity", "sources_q", "text", "tokens", "tpch"):
        try:
            __import__(f"{__name__}.{mod}")
        except ImportError:
            pass
    for name in sorted(REGISTRY):
        REGISTRY[name] = REGISTRY.pop(name)
    return REGISTRY
