"""Property-based tests: random small frames through the engine vs
DuckDB on the same data (hypothesis generates the frames; the engine's
operator semantics must agree with SQL semantics for every input).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from df_spark import Aggregator, Df, Predicate

ints = st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=20)
keys = st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=20)


def duck(rows, sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    return con.execute(sql).fetchall()


@pytest.fixture(scope="module")
def prop_spark():
    from df_spark.session import get_spark

    return get_spark("props", master="local[2]", shuffle_partitions=2)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ks=keys, xs=ints)
def test_group_sum_matches_sql(prop_spark, ks, xs):
    n = min(len(ks), len(xs))
    rows = list(zip(ks[:n], xs[:n]))
    df = Df.from_vecs(prop_spark, [("k", [r[0] for r in rows]), ("x", [r[1] for r in rows])])
    got = sorted(tuple(r) for r in df.group_by("k").aggregate({"x": Aggregator.SUM}).collect())
    want = sorted(duck(rows, "SELECT k, SUM(x) FROM t GROUP BY k"))
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ks=keys, xs=ints, lim=st.integers(min_value=-1000, max_value=1000))
def test_filter_matches_sql(prop_spark, ks, xs, lim):
    n = min(len(ks), len(xs))
    rows = list(zip(ks[:n], xs[:n]))
    df = Df.from_vecs(prop_spark, [("k", [r[0] for r in rows]), ("x", [r[1] for r in rows])])
    got = sorted(tuple(r) for r in df.filter("x", Predicate.gt(lim)).collect())
    want = sorted(duck(rows, f"SELECT k, x FROM t WHERE x > {lim}"))
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ks=keys, xs=ints)
def test_order_by_matches_sql(prop_spark, ks, xs):
    n = min(len(ks), len(xs))
    rows = list(zip(ks[:n], xs[:n]))
    df = Df.from_vecs(prop_spark, [("k", [r[0] for r in rows]), ("x", [r[1] for r in rows])])
    got = [r.k for r in df.order_by("k", "x").collect()]
    want = [r[0] for r in duck(rows, "SELECT k, x FROM t ORDER BY k, x")]
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(la=keys, ra=keys)
def test_join_multiplicity_matches_sql(prop_spark, la, ra):
    lrows = [(k, i) for i, k in enumerate(la)]
    rrows = [(k, i) for i, k in enumerate(ra)]
    left = Df.from_vecs(prop_spark, [("k", [r[0] for r in lrows]), ("x", [r[1] for r in lrows])])
    right = Df.from_vecs(prop_spark, [("j", [r[0] for r in rrows]), ("y", [r[1] for r in rrows])])
    got = sorted(tuple(r) for r in left.join(right, "k", "j").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE l (k BIGINT, x BIGINT); CREATE TABLE r (j BIGINT, y BIGINT)")
    con.executemany("INSERT INTO l VALUES (?, ?)", lrows)
    con.executemany("INSERT INTO r VALUES (?, ?)", rrows)
    want = sorted(con.execute("SELECT k, x, j, y FROM l JOIN r ON k = j").fetchall())
    assert got == want
