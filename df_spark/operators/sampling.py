"""Deterministic sampling operators for corpus curation.

Training-data pipelines need REPRODUCIBLE samples — the same rows
selected on every run, every engine, any partitioning — so these
operators derive the keep/drop decision from a content hash of the id
column (md5-backed ``h32``), never from ``rand()``:

- **bernoulli_sample**: keep a row iff ``h32(id) % denom < rate *
  denom``. Map-side only — no shuffle, no RNG state, trivially
  parallel at any scale, and the SQL twin reproduces the exact row set
  in DuckDB.
- **stratified_sample**: per-stratum rates (e.g. downsample dominant
  languages, keep low-resource ones) via a broadcast rate table joined
  on the stratum column, then the same hash test. One broadcast join,
  zero shuffles of the corpus.

The reference has no sampling surface (its API caps at the relational
core, ``src/api.rs``); these extend the LLM-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h32, h32_sql

SAMPLE_DENOM = 10_000


def _keep(id_col: str, denom: int = SAMPLE_DENOM) -> Column:
    """Deterministic uniform draw in [0, denom) from the id column."""
    return h32(F.col(id_col).cast("string")) % denom


def keep_sql(id_col: str, denom: int = SAMPLE_DENOM) -> str:
    return f"{h32_sql(f'CAST({id_col} AS VARCHAR)')} % {denom}"


def bernoulli_sample(
    df: DataFrame, rate: float, id_col: str, denom: int = SAMPLE_DENOM
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen deterministically by id hash:
    the constant-weight case of :func:`weighted_sample`, delegated so
    the boundary-sensitive double-product comparison (0.57 * 10000 =
    5699.999...) lives in exactly one place."""
    return weighted_sample(df, F.lit(float(rate)), id_col, denom)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    denom: int = SAMPLE_DENOM,
) -> DataFrame:
    """Per-stratum deterministic sampling: row kept iff its id-hash
    draw falls under its stratum's rate. Strata missing from ``rates``
    are dropped (rate 0) — the explicit contract for "keep only the
    languages I budgeted".

    Scale: the rate table is bounded by the stratum cardinality (LHS of
    any corpus: languages, domains, buckets) → broadcast join; the
    corpus never shuffles and the filter runs map-side behind it."""
    spark = df.sparkSession
    rate_rows = [(k, float(v)) for k, v in sorted(rates.items())]
    rates_df = spark.createDataFrame(rate_rows, f"{strata_col} string, __rate double")
    joined = df.join(F.broadcast(rates_df), strata_col)
    return weighted_sample(joined, F.col("__rate"), id_col, denom).drop("__rate")


def stratified_sample_sql(
    table: str,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    denom: int = SAMPLE_DENOM,
) -> str:
    """DuckDB twin of :func:`stratified_sample` (VALUES rate table,
    same hash test)."""
    values = ", ".join(f"('{k}', {float(v)})" for k, v in sorted(rates.items()))
    return f"""
    SELECT t.*
    FROM {table} t
    JOIN (VALUES {values}) AS r({strata_col}, rate)
      ON t.{strata_col} = r.{strata_col}
    WHERE CAST({keep_sql(f't.{id_col}', denom)} AS DOUBLE) < r.rate * {denom}
    """


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str,
    source_col: str = "source",
    denom: int = SAMPLE_DENOM,
) -> DataFrame:
    """Domain mixing: downsample each source so the kept corpus matches
    the target ``weights`` (pretraining data-mix pass). The largest
    feasible corpus honoring the mix is ``N = min_s(count_s /
    weight_s)``; each source then keeps ``weight_s * N / count_s`` of
    its rows via the deterministic id-hash draw. Sources absent from
    ``weights`` are dropped.

    Fully declarative two-pass plan: one count aggregate (map-side
    combine), a source-cardinality-bounded rate table derived in-plan
    (the feasibility min is a 1-row broadcast — no driver loop), then a
    broadcast join + map-side filter over the corpus. All rate
    arithmetic is the same double expression tree in the SQL twin, so
    the kept row set is engine-exact."""
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(weights.items())],
        f"{source_col} string, __w double",
    )
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__c"))
    withw = counts.join(F.broadcast(tgt), source_col)
    feas = withw.agg(F.min(F.col("__c") / F.col("__w")).alias("__n_total"))
    rates = (
        withw.crossJoin(F.broadcast(feas))
        .select(source_col,
                ((F.col("__w") * F.col("__n_total")) / F.col("__c")).alias("__rate"))
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .transform(lambda j: weighted_sample(j, F.col("__rate"), id_col, denom))
        .drop("__rate")
    )


def mix_sources_sql(
    table: str,
    weights: dict[str, float],
    id_col: str,
    source_col: str = "source",
    denom: int = SAMPLE_DENOM,
) -> str:
    """DuckDB twin of :func:`mix_sources` (same expression trees)."""
    values = ", ".join(f"('{k}', {float(v)})" for k, v in sorted(weights.items()))
    return f"""
    WITH tgt({source_col}, w) AS (VALUES {values}),
    counts AS (
      SELECT {source_col}, COUNT(*) AS c FROM {table} GROUP BY {source_col}
    ),
    withw AS (
      SELECT counts.{source_col} AS src, c, w FROM counts
      JOIN tgt ON counts.{source_col} = tgt.{source_col}
    ),
    feas AS (SELECT MIN(c / w) AS n_total FROM withw),
    rates AS (
      SELECT src, (w * n_total) / c AS rate FROM withw, feas
    )
    SELECT t.* FROM {table} t
    JOIN rates ON t.{source_col} = rates.src
    WHERE CAST({keep_sql(f't.{id_col}', denom)} AS DOUBLE) < rate * {denom}
    """


def weighted_sample(
    df: DataFrame, weight: Column, id_col: str, denom: int = SAMPLE_DENOM
) -> DataFrame:
    """Importance sampling: keep each row with probability equal to its
    ``weight`` (a [0,1] column) — deterministically, from the id hash,
    with no RNG state. keep ⟺ draw/denom < weight, evaluated as the
    same double product on both engines (the stratified-sampler
    contract, with a per-ROW rate instead of a per-stratum one).

    The LLM-pipeline use: quality-weighted corpus downsampling — high-
    quality docs survive at their score, junk is kept at junk's rate —
    in one map-side pass, reproducible across re-ingestions. Map-only:
    no shuffle, pushes through any downstream aggregate."""
    return df.filter(
        _keep(id_col, denom).cast("double") < weight.cast("double") * denom
    )


def weighted_sample_sql(
    weight_sql: str, id_col: str, denom: int = SAMPLE_DENOM
) -> str:
    return (
        f"CAST({keep_sql(id_col, denom)} AS DOUBLE) < ({weight_sql}) * {denom}"
    )
