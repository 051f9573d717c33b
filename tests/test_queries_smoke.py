"""Registry-wide smoke: every `queries()` entry runs at sf0.001 with a
stable schema and sane output — catches regressions without DuckDB
(the oracle equivalence itself is tools/check_oracle.py + the driver).
"""

from __future__ import annotations

import pytest

from df_spark.queries import load_registry

REGISTRY = load_registry()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs(spark, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    rows = sdf.limit(1000).collect()
    assert sdf.columns, f"{name}: no columns"
    assert len(set(sdf.columns)) == len(sdf.columns), f"{name}: duplicate column names"
    # queries against the synthetic tables should all produce rows
    assert rows, f"{name}: empty result at sf0.001"
