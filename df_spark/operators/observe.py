"""Zero-cost pipeline observability via ``df.observe``.

A 100 TB pipeline needs row counts / null counts / value totals at each
stage for monitoring and data-quality gates — but a separate
``df.count()`` per stage would re-run the stage. ``Observation``
attaches accumulator-backed metric expressions to the plan
(a ``CollectMetrics`` node): the metrics are computed DURING the one
real pass and cost nothing extra — no second scan, no extra shuffle.

Only deterministic, shuffle-insensitive aggregates belong here
(count/sum/min/max over the rows that actually flow); the helper
rejects nothing at the API level but the test pins the contract that
observed metrics equal a separately-computed aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def with_metrics(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named metric expressions to ``df``'s plan. Returns the
    (unchanged-semantics) frame and the ``Observation`` — read
    ``obs.get`` AFTER an action has materialized the frame."""
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
