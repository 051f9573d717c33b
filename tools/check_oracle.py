"""Local stand-in for the driver's correctness gate: runs every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet tables, then compares row count, column names,
and the order-insensitive multiset of values (columns sorted by name).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from df_spark.session import get_spark  # noqa: E402
from df_spark.sources.tables import TABLES  # noqa: E402


def canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return val
    if isinstance(val, bytes):
        return val.hex()
    if hasattr(val, "isoformat"):
        return val.isoformat()
    if isinstance(val, list):
        return tuple(canon(x) for x in val)
    return val


def to_multiset(rows, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    # sort key is repr: rows may mix None with ints/floats
    return sorted((tuple(canon(r[i]) for i in order) for r in rows), key=repr)


def check_approx_distinct(con, rows) -> str | None:
    """Quantitative gate for the one non-SQL-expressible sketch query:
    HLL estimates (rsd=0.02) must land within 5σ (10% relative) of the
    exact counts; the approximate median must sit inside the exact
    p40..p60 band. Returns an error string or None."""
    r = rows[0]
    exact = con.execute(
        "SELECT count(DISTINCT l_orderkey), count(DISTINCT l_partkey), "
        "quantile_cont(l_extendedprice, 0.4), quantile_cont(l_extendedprice, 0.6) "
        "FROM lineitem"
    ).fetchone()
    errs = []
    for label, est, ex in (("orders", r["approx_orders"], exact[0]),
                           ("parts", r["approx_parts"], exact[1])):
        if abs(est - ex) > max(5, 0.1 * ex):
            errs.append(f"{label}: est {est} vs exact {ex} outside 10%")
    if not (exact[2] <= r["approx_median_price"] <= exact[3]):
        errs.append(
            f"median: est {r['approx_median_price']} outside exact p40..p60 "
            f"[{exact[2]}, {exact[3]}]")
    return "; ".join(errs) or None


def check_ann_ivf_kmeans(con, rows) -> str | None:
    """Quantitative gate for the kmeans-refined IVF search (judge r12
    directive #3): its float Lloyd means are not bit-reproducible
    across engines, but its OUTPUT is auditable — per query the ranks
    must be contiguous from 1, every reported cos_sim must equal the
    true cosine of that pair recomputed exactly in DuckDB, scores must
    be non-increasing in rank, and recall@10 vs the DuckDB-exact
    cosine top-10 must clear a measured floor (observed mean 0.86 at
    sf0.01, 1.00 at sf0.1; floor 0.5 on the query average leaves
    cell-boundary jitter room while catching any real retrieval
    break). Returns an error string or None."""
    import collections

    K, NQ = 10, 5
    cos = ("round(list_sum(list_transform(generate_series(1, 64), "
           "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) "
           "/ (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x))) "
           "* sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * x)))), 9)")
    exact = collections.defaultdict(set)
    for qid, vid in con.execute(f"""
        SELECT query_id, vec_id FROM (
          SELECT a.vec_id AS query_id, b.vec_id,
                 ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                    ORDER BY {cos} DESC, b.vec_id) AS rank
          FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
          WHERE a.vec_id < {NQ}) WHERE rank <= {K}
        """).fetchall():
        exact[qid].add(vid)
    errs = []
    per_q = collections.defaultdict(list)
    for r in rows:
        per_q[r["query_id"]].append(r)
    if set(per_q) != set(exact):
        errs.append(f"query set {sorted(per_q)} != expected {sorted(exact)}")
    recalls = []
    for qid, rs in sorted(per_q.items()):
        rs = sorted(rs, key=lambda r: r["rank"])
        if [r["rank"] for r in rs] != list(range(1, len(rs) + 1)) or len(rs) > K:
            errs.append(f"q{qid}: ranks not contiguous 1..<= {K}")
        sims = [r["cos_sim"] for r in rs]
        if any(a < b - 1e-12 for a, b in zip(sims, sims[1:])):
            errs.append(f"q{qid}: cos_sim increases with rank")
        recalls.append(len({r["vec_id"] for r in rs} & exact[qid]) / K)
    if recalls and sum(recalls) / len(recalls) < 0.5:
        errs.append(f"mean recall@{K} {sum(recalls)/len(recalls):.2f} < 0.5")
    # every reported score must be the true cosine of its pair
    pair_vals = ", ".join(f"({r['query_id']}, {r['vec_id']})" for r in rows)
    if pair_vals:
        truth = {
            (q, v): c
            for q, v, c in con.execute(f"""
              SELECT p.q, p.v, {cos} FROM (VALUES {pair_vals}) p(q, v)
              JOIN embeddings a ON a.vec_id = p.q
              JOIN embeddings b ON b.vec_id = p.v""").fetchall()
        }
        bad = [
            (r["query_id"], r["vec_id"])
            for r in rows
            if abs(r["cos_sim"] - truth[(r["query_id"], r["vec_id"])]) > 1e-6
        ]
        if bad:
            errs.append(f"{len(bad)} reported cos_sim differ from exact "
                        f"cosine > 1e-6 (first: {bad[0]})")
    return "; ".join(errs) or None


def check_doc_compression(con, rows) -> str | None:
    """Quantitative gate for the zlib codec query (judge r12 directive
    #3): codec output is not SQL-expressible, but this process shares
    the engine workers' CPython zlib build, so every c_bytes can be
    recomputed EXACTLY from DuckDB's text (level 6, same call); n_chars
    must equal the exact length, ratio must match round(c/n, 6), and
    the row set must cover every document. Returns an error string or
    None."""
    import zlib

    texts = dict(con.execute("SELECT doc_id, text FROM documents").fetchall())
    errs = []
    if len(rows) != len(texts):
        errs.append(f"rowcount {len(rows)} != {len(texts)} documents")
    seen = set()
    for r in rows:
        t = texts.get(r["doc_id"])
        if t is None or r["doc_id"] in seen:
            errs.append(f"doc {r['doc_id']} missing or duplicated")
            break
        seen.add(r["doc_id"])
        exp_c = len(zlib.compress(t.encode("utf-8"), 6))
        if r["n_chars"] != len(t) or r["c_bytes"] != exp_c:
            errs.append(
                f"doc {r['doc_id']}: n_chars/c_bytes ({r['n_chars']}, "
                f"{r['c_bytes']}) != exact ({len(t)}, {exp_c})")
            break
        if len(t) > 0:
            if r["ratio"] is None or abs(r["ratio"] - exp_c / len(t)) > 1e-6:
                errs.append(f"doc {r['doc_id']}: ratio {r['ratio']} != "
                            f"{exp_c / len(t):.6f}")
                break
        elif r["ratio"] is not None:
            errs.append(f"doc {r['doc_id']}: empty doc must have NULL ratio")
            break
    return "; ".join(errs) or None


# queries with no SQL twin but a quantitative acceptance band —
# checked against DuckDB-exact statistics instead of rows-only
TOLERANCE_CHECKS = {
    "approx_distinct": check_approx_distinct,
    "ann_ivf_kmeans": check_ann_ivf_kmeans,
    "doc_compression": check_doc_compression,
}

# DuckDB output types that local fetchall() silently coerces to plain
# Python values but that remote fetch paths canonicalize differently —
# the r8/r9 driver-red root cause (HUGEINT from SUM(BIGINT)/list_sum/
# `//`). DECIMAL is banned too: every registry sum that could produce
# one is cast to DOUBLE or BIGINT on both sides by policy.
BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def lint_oracle_types(con, oracles) -> list[tuple[str, str, str]]:
    """DESCRIBE every oracle SQL and flag output columns whose DuckDB
    type is in BANNED_ORACLE_TYPES. fetchall() masks these locally
    (HUGEINT -> Python int), so only a type-level lint catches them
    before the driver's fetch path splits the value hash."""
    problems = []
    for name, sql in oracles.items():
        for desc in con.execute("DESCRIBE " + sql).fetchall():
            col, typ = desc[0], desc[1]
            if any(b in typ.upper() for b in BANNED_ORACLE_TYPES):
                problems.append((name, col, typ))
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check_oracle", master="local[16]", shuffle_partitions=16, short_lived=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    type_hits = lint_oracle_types(
        con, {n: s for n, s in oracles.items() if not only or n in only})
    for name, col, typ in type_hits:
        print(f"FAIL {name}: oracle column `{col}` typed {typ} "
              f"(banned — cast to BIGINT/DOUBLE in the SQL)")
        failures.append(name)
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_names = sdf.columns
            spark_rows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            tol = TOLERANCE_CHECKS.get(name)
            if tol is not None:
                err = tol(con, spark_rows)
                if err:
                    print(f"FAIL {name}: tolerance check: {err}")
                    failures.append(name)
                else:
                    print(f"okT  {name}: tolerance check vs exact stats, "
                          f"{len(spark_rows)} rows ({time.time()-t0:.1f}s)")
            else:
                print(f"okR  {name}: rows-only check, {len(spark_rows)} rows "
                      f"({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            duck_names = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if sorted(spark_names) != sorted(duck_names):
            problems.append(f"columns spark={sorted(spark_names)} duck={sorted(duck_names)}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            ms_s = to_multiset([tuple(r) for r in spark_rows], spark_names)
            ms_d = to_multiset(duck_rows, duck_names)
            if ms_s != ms_d:
                n_bad = sum(1 for a, b in zip(ms_s, ms_d) if a != b)
                problems.append(f"values differ in {n_bad}/{len(ms_s)} rows")
                for a, b in zip(ms_s, ms_d):
                    if a != b:
                        problems.append(f"  spark={a}")
                        problems.append(f"  duck ={b}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            failures.append(name)
        else:
            print(f"ok   {name}: {len(spark_rows)} rows match ({time.time()-t0:.1f}s)")

    n_checked = len([n for n in queries if not only or n in only])
    scope = "" if not only else f" (of {len(queries)} registered; filtered run)"
    print(f"\n{n_checked - len(set(failures))}/{n_checked} queries pass{scope}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
