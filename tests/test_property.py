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


def _z_py(x: int, y: int, bits: int = 12) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def _z_decode(z: int, bits: int = 12) -> tuple[int, int]:
    x = y = 0
    for i in range(bits):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    return x, y


@settings(max_examples=200, deadline=None)
@given(x=st.integers(min_value=0, max_value=4095),
       y=st.integers(min_value=0, max_value=4095))
def test_zvalue_bijective(x, y):
    """Morton interleave is a bijection on 12-bit pairs — decode
    recovers exactly (x, y), so z-clustering loses no information."""
    assert _z_decode(_z_py(x, y)) == (x, y)


def test_zvalue_spark_matches_python_mirror(prop_spark):
    """The Spark shift/mask expression computes the same Morton code as
    the bit-twiddling reference implementation."""
    from pyspark.sql import functions as F

    from df_spark.functions.hashing import zvalue

    pts = [(0, 0), (1, 0), (0, 1), (4095, 4095), (2748, 1365), (123, 4000)]
    df = prop_spark.createDataFrame(pts, "x int, y int")
    got = {(r.x, r.y): r.z for r in
           df.select("x", "y", zvalue(F.col("x"), F.col("y")).alias("z")).collect()}
    for x, y in pts:
        assert got[(x, y)] == _z_py(x, y)


@settings(max_examples=200, deadline=None)
@given(counts=st.lists(st.integers(min_value=0, max_value=10_000),
                       min_size=2, max_size=50))
def test_anomaly_integer_test_equals_float_z(counts):
    """The BIGINT inequality (c·n−S)² > 9·(n·Q−S²) flags exactly the
    buckets a float 3σ population z-test flags (strict inequality on
    both sides; ties cannot occur because one side is rational with
    denominator n² and the other is an integer times it)."""
    n = len(counts)
    s = sum(counts)
    q = sum(c * c for c in counts)
    mean = s / n
    var = q / n - mean * mean
    for c in counts:
        int_flag = (c * n - s) > 0 and (c * n - s) ** 2 > 9 * (n * q - s * s)
        float_flag = c > mean and (c - mean) ** 2 * n * n > 9 * (n * q - s * s) * (1 + 0)
        # evaluate float test in the exact same scaled form to avoid FP
        # rounding ambiguity, then the unscaled float form loosely
        z_flag = c > mean and (var > 0 and (c - mean) > 3 * var ** 0.5 - 1e-9)
        assert int_flag == float_flag
        if var > 0:
            assert int_flag == z_flag or abs((c - mean) - 3 * var ** 0.5) < 1e-6
