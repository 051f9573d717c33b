"""The engine's UDF tier — the sanctioned slow path, Arrow-batched
only (never row-at-a-time Python):

- scalar ``pandas_udf``: vectorized series→series (numpy under the
  hood; ~10-100× over row UDFs, still JVM→Arrow→Python round-trip, so
  use only when no builtin expresses it)
- grouped ``applyInPandas``: per-group pandas frame in/out (the
  reference had no UDF surface at all — SURVEY §2 checklist)

Everything here also has a pure-builtin twin where possible; the UDFs
exist to document the pattern and for genuinely non-expressible logic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def winsorize_99(s: pd.Series) -> pd.Series:
    """Clip a numeric column at its batch-local 1st/99th percentile —
    per-batch robust clipping for feature pipelines."""
    lo, hi = s.quantile(0.01), s.quantile(0.99)
    return s.clip(lo, hi)


@F.pandas_udf(T.ArrayType(T.DoubleType()))
def unit_normalize(v: pd.Series) -> pd.Series:
    """L2-normalize an array<float> column (vectorized via numpy)."""
    import numpy as np

    def norm(x):
        if x is None:
            return None
        a = np.asarray(x, dtype="float64")
        n = float(np.linalg.norm(a))
        return (a / n).tolist() if n > 0 else a.tolist()

    return v.map(norm)


def zscore_per_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group z-score via applyInPandas (grouped-map). The builtin
    twin is mean/stddev window functions; this documents the
    grouped-pandas pattern for logic windows can't express."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", zscore double"

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std()
        mean = pdf[value_col].mean()
        pdf = pdf.copy()
        pdf["zscore"] = 0.0 if not std or std != std else (pdf[value_col] - mean) / std
        return pdf

    return df.groupBy(group_col).applyInPandas(per_group, schema=out_schema)


@F.pandas_udf(T.LongType())
def zlib_bytes(s: pd.Series) -> pd.Series:
    """Compressed size (zlib level 6) of a text column — the classic
    compression-ratio quality heuristic (highly repetitive machine
    text compresses far below natural prose). No builtin expresses
    codec output, so this is genuine Arrow-batched UDF territory;
    level is pinned for determinism within a zlib build."""
    import zlib

    return s.map(
        lambda t: len(zlib.compress(t.encode("utf-8"), 6)) if t is not None else None
    )
