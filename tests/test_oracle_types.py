"""Registry-wide DESCRIBE lint of every DuckDB oracle SQL's output
column types.

Why this exists: in rounds 8 and 9 the only driver-red correctness
rows (`embed_quantize`, `ngram_repetition`) were caused by oracle
columns typed HUGEINT — DuckDB's result type for ``SUM(BIGINT)``,
``list_sum`` over BIGINT, and ``//`` over a HUGEINT operand. Local
``fetchall()`` converts HUGEINT to a plain Python int, so the value
check passes locally while the driver's fetch path canonicalizes
HUGEINT differently and the hash splits. Only a type-level lint
catches the class before shipping. No Spark session needed — DESCRIBE
is a DuckDB-planning-only operation over the registered views.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from df_spark.sources.tables import TABLES  # noqa: E402
from tools.check_oracle import (  # noqa: E402
    BANNED_ORACLE_TYPES,
    lint_oracle_types,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_no_banned_oracle_output_types(con):
    hits = lint_oracle_types(con, entry_mod.oracle_sql())
    assert hits == [], (
        "oracle SQLs emit driver-hash-unsafe column types "
        f"(cast to BIGINT/DOUBLE): {hits}"
    )


def test_lint_catches_hugeint(con):
    # Regression guard for the lint itself: an uncast SUM(BIGINT) is
    # HUGEINT and must be flagged; the ::BIGINT form must pass.
    bad = {"x": "SELECT SUM(o_orderkey) AS s FROM orders"}
    good = {"x": "SELECT SUM(o_orderkey)::BIGINT AS s FROM orders"}
    assert [h[1] for h in lint_oracle_types(con, bad)] == ["s"]
    assert lint_oracle_types(con, good) == []


def test_banned_set_covers_the_known_class():
    assert {"HUGEINT", "UHUGEINT", "DECIMAL"} <= set(BANNED_ORACLE_TYPES)
