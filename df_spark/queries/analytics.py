"""Analytics-surface extensions: full-outer join, set operations
(INTERSECT / EXCEPT), skew-salted join, cohort retention, and BM25
ranked retrieval. All exact-match against the DuckDB oracle.

Reference parity note: angelini/df stops at inner equi-joins
(src/dataframe.rs join path) and has no set ops beyond union
(src/api.rs); these queries extend that surface with the remaining
relational operators a user would expect, expressed as built-in
Spark operators (no UDFs, no driver loops).

Determinism:
- counts / keys are integers → exact.
- money sums go through DECIMAL(18,2) (associative) per the registry
  policy.
- BM25 uses the *rational* IDF form (N - df + 0.5) / (df + 0.5)
  instead of ln(·): libm log rounding is not guaranteed identical
  across engines, division is (same policy as tfidf_top_terms). The
  per-term scores are combined by explicit fixed-order addition —
  not SUM — so the FP operation order is identical on both engines
  and the result is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.text import normalized_sql
from ..operators.joins import salted_join
from ..sources.tables import load_sdf
from . import register


@register(
    "join_full_outer",
    sql="""
    SELECT COALESCE(o.custkey, c.c_custkey) AS custkey,
           c.c_name AS name,
           o.n_orders,
           o.total_spent
    FROM (SELECT o_custkey AS custkey,
                 COUNT(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_spent
          FROM orders
          WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 1
          GROUP BY 1) o
    FULL OUTER JOIN (SELECT c_custkey, c_name FROM customer
                     WHERE c_acctbal < 0) c
      ON o.custkey = c.c_custkey
    """,
)
def join_full_outer(spark, sf_dir):
    # full-outer equi-join with null rows on BOTH sides: debtors with no
    # Jan-1995 orders (right-only; every customer has SOME order in the
    # synthetic data, so the left side is month-scoped) and Jan-1995
    # buyers outside the balance filter (left-only). One shuffle on
    # custkey; at 100 TB this is a plain hash-partitioned SMJ/SHJ — AQE
    # decides.
    orders = load_sdf(spark, sf_dir, "orders").filter(
        (F.year("o_orderdate") == 1995) & (F.month("o_orderdate") == 1)
    )
    customer = load_sdf(spark, sf_dir, "customer")
    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_spent"),
    )
    debtors = customer.filter(F.col("c_acctbal") < 0).select(
        "c_custkey", "c_name"
    )
    return (
        per_cust.join(
            debtors, per_cust.custkey == debtors.c_custkey, "full_outer"
        )
        .select(
            F.coalesce("custkey", "c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            "n_orders",
            "total_spent",
        )
    )


@register(
    "set_ops",
    sql="""
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE year(o_orderdate) = 1995),
         b AS (SELECT DISTINCT o_custkey FROM orders
               WHERE year(o_orderdate) = 1996)
    SELECT 'both' AS segment, o_custkey AS custkey
    FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
    UNION ALL
    SELECT 'only_1995' AS segment, o_custkey AS custkey
    FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
    UNION ALL
    SELECT 'only_1996' AS segment, o_custkey AS custkey
    FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
    """,
)
def set_ops(spark, sf_dir):
    # INTERSECT / EXCEPT compile to left-semi / left-anti hash joins
    # over the distinct key sets — one shuffle each on the key, no
    # full-row comparison. The year filter is pushed to the scan.
    orders = load_sdf(spark, sf_dir, "orders")
    year = F.year("o_orderdate")
    a = orders.filter(year == 1995).select("o_custkey").distinct()
    b = orders.filter(year == 1996).select("o_custkey").distinct()
    tag = lambda df, s: df.select(  # noqa: E731
        F.lit(s).alias("segment"), F.col("o_custkey").alias("custkey")
    )
    return (
        tag(a.intersect(b), "both")
        .unionByName(tag(a.subtract(b), "only_1995"))
        .unionByName(tag(b.subtract(a), "only_1996"))
    )


@register(
    "skew_salted_join",
    sql="""
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def skew_salted_join(spark, sf_dir):
    # the salted-join operator under an exact oracle: the plain-SQL
    # join result must survive salting unchanged (each left row meets
    # exactly its one replica). At 100 TB this is the mitigation for a
    # power-law FK where one key floods a single task and AQE's
    # skew-split isn't available (e.g. a bucketed pre-shuffle layout
    # that AQE won't break); salt=8 caps any key's share of a task at
    # 1/8 of its rows.
    lineitem = load_sdf(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_sdf(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(lineitem, orders, "l_orderkey", "o_orderkey", salt=8)
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "cohort_retention",
    sql="""
    WITH e AS (SELECT user_id,
                      CAST(floor(epoch_us(CAST(ts AS TIMESTAMP))
                                 / 86400000000) AS BIGINT) AS day
               FROM events),
         f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY 1)
    SELECT strftime(DATE '1970-01-01' + INTERVAL (f.cohort_day) DAY,
                    '%Y-%m-%d') AS cohort_day,
           CAST((e.day - f.cohort_day) // 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_users,
           COUNT(*) AS n_events
    FROM e JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark, sf_dir):
    # classic cohort/retention matrix: users bucketed by first-seen
    # day, activity counted per whole-week offset. All time arithmetic
    # is integer (epoch-µs → day number → week offset) so both engines
    # agree exactly; the cohort label is formatted from the day number,
    # never via engine-specific week truncation. Two shuffles: the
    # per-user MIN (|users| rows out — tiny vs |events|) and the final
    # (cohort, offset) agg; the events→firsts join is on user_id and
    # AQE will broadcast the firsts side.
    ev = load_sdf(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.floor(F.unix_micros("ts") / F.lit(86_400_000_000)).alias("day"),
    )
    firsts = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        e.join(firsts, "user_id")
        .groupBy(
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"), F.col("cohort_day").cast("int")),
                "yyyy-MM-dd",
            ).alias("cohort_day"),
            F.floor((F.col("day") - F.col("cohort_day")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# BM25 constants: k1/b are the classic defaults; terms are chosen for
# spread in document frequency (dup is rare, vector/key are common)
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("dup", "vector", "key")
_BM25_TOPK = 25


def _bm25_term_score_sql(tf: str, dl: str, avgdl: str, df: str, n: str) -> str:
    k1, b = _BM25_K1, _BM25_B
    idf = f"(({n} - {df} + 0.5) / ({df} + 0.5))"
    sat = (
        f"({tf} * ({k1} + 1.0) / "
        f"({tf} + {k1} * (1.0 - {b} + {b} * {dl} / {avgdl})))"
    )
    return f"({idf} * {sat})"


@register(
    "bm25_rank",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split({normalized_sql('text')}, ' ')) AS token
      FROM documents
    ), tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok2 GROUP BY 1),
    stats AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
                     COUNT(*) AS n_docs FROM dl),
    tf AS (SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS tf
           FROM tok2 WHERE token IN {str(tuple(_BM25_TERMS))}
           GROUP BY 1, 2),
    dfreq AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
              FROM tok2 WHERE token IN {str(tuple(_BM25_TERMS))}
              GROUP BY 1),
    scored AS (
      SELECT tf.doc_id, tf.token,
             {_bm25_term_score_sql(
                 'tf.tf', 'CAST(dl.dl AS DOUBLE)', 'stats.avgdl',
                 'dfreq.df', 'CAST(stats.n_docs AS DOUBLE)')} AS s
      FROM tf
      JOIN dl ON tf.doc_id = dl.doc_id
      JOIN dfreq ON tf.token = dfreq.token
      CROSS JOIN stats
    ), pivoted AS (
      SELECT doc_id,
             COALESCE(MAX(CASE WHEN token = '{_BM25_TERMS[0]}' THEN s END), 0.0)
             + COALESCE(MAX(CASE WHEN token = '{_BM25_TERMS[1]}' THEN s END), 0.0)
             + COALESCE(MAX(CASE WHEN token = '{_BM25_TERMS[2]}' THEN s END), 0.0)
               AS score
      FROM scored GROUP BY 1
    )
    SELECT doc_id, score, rank FROM (
      SELECT doc_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM pivoted) t
    WHERE rank <= {_BM25_TOPK}
    """,
)
def bm25_rank(spark, sf_dir):
    """BM25-style ranked retrieval over the documents corpus for a
    fixed term set — the scoring pass of a search/retrieval pipeline.

    Scale shape: tokenize is a narrow map; per-doc length and per-term
    tf are one hash-agg each on uniform keys; df and corpus stats are
    3-row / 1-row aggregates broadcast back onto the term rows (AQE
    broadcasts them — no shuffle of the corpus-sized side); the final
    global top-k compiles to TakeOrderedAndProject. The only global
    barrier is the 1-row corpus-stats agg, unavoidable in any engine.

    Per-term scores are combined by explicit fixed-order addition of
    the three pivoted columns (not SUM) so the FP operation order
    matches the oracle bit-for-bit; IDF is the rational form (see
    module docstring).
    """
    # shared memoized token scan (queries.tokens.TOKEN_MEMO): one
    # normalize→split→explode checkpoint per session feeds the whole
    # token family instead of each query re-scanning raw parquet
    from .tokens import _tokens_sdf

    tok = _tokens_sdf(spark, sf_dir)

    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).cast("double").alias("n_docs"),
    )
    hits = tok.filter(F.col("token").isin(*_BM25_TERMS))
    tf = hits.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dfreq = hits.groupBy("token").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )

    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    sat = (F.col("tf") * (k1 + F.lit(1.0))) / (
        F.col("tf")
        + k1
        * (
            F.lit(1.0)
            - b
            + b * F.col("dl").cast("double") / F.col("avgdl")
        )
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "token", (idf * sat).alias("s"))
    )
    term_col = [
        F.coalesce(
            F.max(F.when(F.col("token") == t, F.col("s"))), F.lit(0.0)
        )
        for t in _BM25_TERMS
    ]
    pivoted = scored.groupBy("doc_id").agg(
        (term_col[0] + term_col[1] + term_col[2]).alias("score")
    )
    # global top-k FIRST (TakeOrderedAndProject — per-partition heaps,
    # never a single-partition window over the full scored set), then
    # rank assignment runs on only k rows
    top = pivoted.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(_BM25_TOPK)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.select(
        "doc_id", "score", F.row_number().over(w).alias("rank")
    )


@register(
    "last_touch_attribution",
    sql="""
    WITH seq AS (
      SELECT user_id, event_type, value,
             last_value(CASE WHEN event_type IN ('click', 'view', 'signup')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS channel
      FROM events
    )
    SELECT coalesce(channel, 'direct') AS channel,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             AS attributed_value
    FROM seq
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def last_touch_attribution(spark, sf_dir):
    """Marketing-style last-touch attribution: each purchase is
    credited to the user's most recent preceding touch event (click /
    view / signup — errors and earlier purchases never attribute),
    'direct' when no touch precedes it. One window over (user_id, ts,
    event_id) with an ignore-nulls running last — the as-of-join
    semantics expressed as a single pass instead of a self-join.

    100 TB story: exactly one shuffle (hash on user_id), then a
    map-side running state per user and a tiny rollup; the event_id
    tiebreak makes the frame deterministic under equal timestamps on
    both engines.
    """
    events = load_sdf(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type").isin("click", "view", "signup"), F.col("event_type")
    )
    seq = events.select(
        "user_id",
        "event_type",
        "value",
        F.last(touch, ignorenulls=True).over(w).alias("channel"),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("channel"), F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("attributed_value"),
        )
    )


@register(
    "interval_overlap_join",
    sql="""
    WITH w AS (
      SELECT o_custkey, o_orderkey,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) AS s
      FROM orders
    ),
    pairs AS (
      SELECT a.o_custkey AS custkey
      FROM w a JOIN w b
        ON a.o_custkey = b.o_custkey
       AND a.o_orderkey < b.o_orderkey
       AND a.s < b.s + 30 * 86400
       AND b.s < a.s + 30 * 86400
    ),
    counted AS (
      SELECT custkey, COUNT(*) AS n_overlaps FROM pairs GROUP BY custkey
    )
    SELECT custkey, n_overlaps FROM (
      SELECT custkey, n_overlaps,
             ROW_NUMBER() OVER (ORDER BY n_overlaps DESC, custkey) AS rn
      FROM counted
    ) WHERE rn <= 100
    """,
)
def interval_overlap_join(spark, sf_dir):
    """Interval-overlap self-join: each order opens a 30-day service
    window; count, per customer, the pairs of that customer's windows
    that overlap (the double-charge / concurrent-subscription shape).
    Overlap of half-open [s, s+30d) pairs reduces to |s_a - s_b| < 30d.

    Scale: the join is an EQUI-join on the customer key — the interval
    predicate is a post-join filter, never a cross product; fan-out is
    bounded by orders-per-customer (TPC-H: ~10), so output is linear in
    orders. One shuffle on custkey, a hash agg on the same key (no
    second exchange), then TakeOrderedAndProject for the top slice. At
    100 TB the same plan holds; a pathological mega-customer would be
    AQE skew-split."""
    orders = load_sdf(spark, sf_dir, "orders")
    w = orders.select(
        "o_custkey", "o_orderkey", F.unix_timestamp("o_orderdate").alias("s")
    )
    a = w.select(F.col("o_custkey").alias("custkey"),
                 F.col("o_orderkey").alias("ka"), F.col("s").alias("sa"))
    b = w.select(F.col("o_custkey").alias("custkey"),
                 F.col("o_orderkey").alias("kb"), F.col("s").alias("sb"))
    pairs = a.join(b, "custkey").filter(
        (F.col("ka") < F.col("kb"))
        & (F.col("sa") < F.col("sb") + 30 * 86400)
        & (F.col("sb") < F.col("sa") + 30 * 86400)
    )
    counted = pairs.groupBy("custkey").agg(F.count(F.lit(1)).alias("n_overlaps"))
    return counted.orderBy(F.desc("n_overlaps"), "custkey").limit(100)


@register(
    "events_regression",
    sql="""
    WITH pts AS (
      SELECT event_type,
             (CAST(floor(epoch(ts)) AS BIGINT) - 1704067200) // 3600 AS x,
             CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS y
      FROM events
    ),
    s AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
           CASE WHEN CAST(n * sxx - sx * sx AS BIGINT) <> 0
                THEN CAST(CAST(n * sxy - sx * sy AS BIGINT) AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS BIGINT)
           END AS slope_centi_per_hour
    FROM s
    """,
)
def events_regression(spark, sf_dir):
    """Per-group least-squares trend (does each event type's value
    drift over the month?) with BIT-EXACT sums: x is the hour bucket,
    y the value in integer cents, so every moment (Sx, Sy, Sxy, Sxx)
    and the closed-form slope numerator/denominator are associative
    BIGINT arithmetic — the oracle can hash them exactly, which no
    double-typed regr_slope() can offer. Only the final ratio is a
    single double division (one IEEE op, identical on both engines).

    Overflow headroom: x <= 744 (a month of hours), y <= 5e4, so
    n*Sxy < 4e18 stays in BIGINT up to ~1e6 rows/group (sf1); larger
    corpora re-bucket x (day granularity) or widen to DECIMAL(38,0).

    Scale: one map-side projection + one hash aggregate — partial
    aggregation makes the shuffle six longs per (partition, group)."""
    events = load_sdf(spark, sf_dir, "events")
    pts = events.select(
        "event_type",
        # anchored to the corpus epoch (2024-01-01 UTC): absolute epoch
        # hours are ~4.7e5 and push n*Sxx past BIGINT at sf0.1 —
        # caught by the sf0.1 oracle run as an ANSI overflow error
        F.expr("(unix_timestamp(ts) - 1704067200) div 3600").alias("x"),
        (F.col("value").cast("decimal(10,2)") * 100).cast("long").alias("y"),
    )
    s = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("long")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("long")
    return s.select(
        "event_type",
        "n",
        num.alias("slope_num"),
        den.alias("slope_den"),
        # den = n^2 * var(x) is 0 for a group whose x is constant (one
        # hour bucket): emit NULL slope instead of an ANSI div-by-zero
        F.when(den != 0, num.cast("double") / den).alias("slope_centi_per_hour"),
    )


@register(
    "nullsafe_join",
    sql="""
    WITH l AS (
      SELECT CASE WHEN o_orderkey % 11 = 0 THEN NULL
                  ELSE o_custkey % 50 END AS grp,
             o_totalprice
      FROM orders
    ),
    r AS (SELECT DISTINCT grp FROM l)
    SELECT coalesce(CAST(r.grp AS VARCHAR), 'null') AS grp_label,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM l JOIN r ON l.grp IS NOT DISTINCT FROM r.grp
    GROUP BY 1
    """,
)
def nullsafe_join(spark, sf_dir):
    """Null-safe equality join (Spark ``<=>`` / SQL IS NOT DISTINCT
    FROM): a deterministic 1-in-11 slice of orders gets a NULL
    grouping key, and the join against the distinct-key dim must MATCH
    the NULL row (a plain equi-join silently drops that whole
    partition of the data — the classic silent-loss bug in fact/dim
    pipelines). The 'null' row in the hashed output is the proof.

    Scale: null-safe equality still hash-partitions both sides (NULL
    is just one more key value), so the plan is an ordinary shuffle or
    broadcast hash join — no nested-loop fallback."""
    orders = load_sdf(spark, sf_dir, "orders")
    left = orders.select(
        F.when(F.col("o_orderkey") % 11 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("o_custkey") % 50)
        .alias("grp"),
        "o_totalprice",
    )
    right = left.select(F.col("grp").alias("rgrp")).distinct()
    j = left.join(right, left["grp"].eqNullSafe(right["rgrp"]))
    return j.groupBy(
        F.coalesce(F.col("rgrp").cast("string"), F.lit("null")).alias("grp_label")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


@register(
    "join_hint_shuffle_hash",
    sql="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS segment_total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def join_hint_shuffle_hash(spark, sf_dir):
    """Join-strategy HINT surface: the same orders-customer equi-join
    forced through SHUFFLE_HASH instead of letting the planner pick
    broadcast/SMJ — the escape hatch for the 100 TB case Catalyst
    gets wrong (a build side that is small per partition but over the
    broadcast threshold, where sort-merge pays two sorts for
    nothing). The hint changes the PHYSICAL strategy only; the oracle
    pins that values are identical to the plain join, and
    ``test_join_hint_yields_shuffled_hash_join`` pins that the plan
    actually contains ShuffledHashJoin (a hint Spark silently ignores
    is the real-world failure mode this row guards).

    Scale shape: one shuffle per side on the join key, hash build on
    the (hinted) customer side per partition — no sort, no broadcast
    collect; at 100 TB this is the strategy for mid-size dims that
    fit executor memory per-partition but not on the driver."""
    orders = load_sdf(spark, sf_dir, "orders")
    cust = load_sdf(spark, sf_dir, "customer").hint("SHUFFLE_HASH")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .alias("segment_total"),
        )
    )


@register(
    "grouped_median_filter",
    sql="""
    WITH ranked AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    ),
    med AS (
      SELECT lang, n_chars AS med_chars
      FROM ranked WHERE rn = (n + 1) // 2
    )
    SELECT d.lang,
           med.med_chars,
           SUM(CASE WHEN d.n_chars > med.med_chars THEN 1 ELSE 0 END)::BIGINT
             AS n_above,
           SUM(CASE WHEN d.n_chars <= med.med_chars THEN 1 ELSE 0 END)::BIGINT
             AS n_at_or_below
    FROM documents d JOIN med USING (lang)
    GROUP BY d.lang, med.med_chars
    """,
)
def grouped_median_filter(spark, sf_dir):
    """Per-group EXACT median as a length-filter threshold: the
    rank-based lower median of n_chars per language (rn == (n+1)//2
    under a total order tie-broken by doc_id — an integer the two
    engines cannot disagree on, unlike interpolated percentiles whose
    float midpoints tie-split), joined back to classify every doc
    against its own language's threshold. This is the per-language
    length gate of a curation pipeline, where a global cutoff is wrong
    because languages have different character economics.

    Scale shape: one window pass partitioned by lang (bounded key
    count, but a HOT key risk when one lang dominates — at 100 TB the
    fix is computing the same rank threshold via approx_percentile
    per group or a two-pass count+offset read, same join shape); the
    medians relation is tiny and broadcasts back onto the scan."""
    from pyspark.sql import Window as W

    docs = load_sdf(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "lang", "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("lang")).alias("n"),
    )
    med = ranked.filter(
        F.col("rn") == ((F.col("n") + 1) / 2).cast("long")
    ).select("lang", F.col("n_chars").alias("med_chars"))
    above = F.col("n_chars") > F.col("med_chars")
    return (
        docs.join(F.broadcast(med), "lang")
        .groupBy("lang", "med_chars")
        .agg(
            F.sum(F.when(above, 1).otherwise(0)).cast("long").alias("n_above"),
            F.sum(F.when(above, 0).otherwise(1)).cast("long")
            .alias("n_at_or_below"),
        )
    )


@register(
    "join_skew_report",
    sql="""
    WITH kc AS (
      SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1
    ),
    g AS (
      SELECT COUNT(*) AS n_keys, SUM(cnt)::BIGINT AS total_rows,
             MAX(cnt) AS max_cnt
      FROM kc
    )
    SELECT kc.user_id, kc.cnt::BIGINT AS cnt,
           ((1000 * kc.cnt) // g.total_rows)::BIGINT AS share_permille,
           g.n_keys::BIGINT AS n_keys, g.total_rows,
           ((1000 * g.max_cnt * g.n_keys) // g.total_rows)::BIGINT
             AS skew_ratio_permille
    FROM kc, g
    ORDER BY kc.cnt DESC, kc.user_id ASC
    LIMIT 10
    """,
)
def join_skew_report(spark, sf_dir):
    """Join-key skew pre-flight: before shuffling a 100 TB fact table
    on a key, profile the key's distribution — per-key row counts, the
    top heavy hitters with their permille share, and the global skew
    ratio (max key count vs the uniform-average count, in permille) —
    the diagnosis that decides between a plain shuffle join, AQE skew
    splitting, and explicit salting (``skew_salted_join`` is the cure;
    this row is the X-ray that justifies it).

    Scale shape: one hash aggregate keyed on the join key (map-side
    combine absorbs the skew being measured — a hot key's rows
    pre-aggregate within each input partition, so the shuffle carries
    one row per key per map task, never the raw fact rows); the global
    stats reduce the per-key frame to ONE row that broadcasts back
    over the top-k; top-k is a bounded TakeOrdered, not a full sort.

    Determinism: counts are exact integers; share/skew are integer
    floor-divisions; ties in cnt break on user_id asc.
    """
    ev = load_sdf(spark, sf_dir, "events")
    kc = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    g = kc.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    return (
        kc.join(F.broadcast(g))
        .select(
            "user_id",
            F.col("cnt").cast("long").alias("cnt"),
            F.expr("(1000 * cnt) div total_rows").alias("share_permille"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("total_rows").cast("long").alias("total_rows"),
            F.expr("(1000 * max_cnt * n_keys) div total_rows")
            .alias("skew_ratio_permille"),
        )
        .orderBy(F.col("cnt").desc(), F.col("user_id").asc())
        .limit(10)
    )


@register(
    "grouping_sets_agg",
    sql="""
    SELECT l_returnflag, l_linestatus,
           (2 * GROUPING(l_returnflag) + GROUPING(l_linestatus))::BIGINT
             AS gid,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2)))
                AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    """,
)
def grouping_sets_agg(spark, sf_dir):
    """GROUPING SETS with a grouping-id discriminator — the missing
    sibling of the registry's CUBE/ROLLUP rows: one aggregation pass
    that emits the (flag, status) detail, the per-flag subtotal, and
    the grand total, with ``gid`` disambiguating NULL-as-subtotal from
    a (hypothetically) NULL group value — the SQL-surface contract BI
    layers compile to. Expressed via ``spark.sql`` over a registered
    temp view (the declared-SQL path, same as ``sql_surface``), so
    Catalyst plans the Expand + single hash aggregate itself.

    Scale shape: Expand multiplies each input row by the number of
    grouping sets (3 here) BEFORE the exchange, but partial
    aggregation collapses per-set keys map-side, so the shuffle
    carries |flags x statuses| + |flags| + 1 rows per map task — the
    same one-pass multi-granularity trick as ``rollup_hypertable``.

    Money follows the registry DECIMAL policy; gid composes
    GROUPING() bits identically in both engines (Spark's
    ``grouping_id()`` bit order is column order, matched explicitly).
    """
    li = load_sdf(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__gs_lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(2 * grouping(l_returnflag) + grouping(l_linestatus)
                    AS BIGINT) AS gid,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2)))
                    AS DOUBLE) AS revenue
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
    """)


@register(
    "mad_outliers",
    sql="""
    WITH v AS (
      SELECT event_type, event_id,
             CAST(round(value * 100, 0) AS BIGINT) AS c
      FROM events
    ),
    r1 AS (
      SELECT event_type, c,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY c, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v
    ),
    med AS (SELECT event_type, c AS med_c FROM r1 WHERE rn = (n + 1) // 2),
    d AS (
      SELECT v.event_type, v.event_id, abs(v.c - med.med_c) AS dev
      FROM v JOIN med USING (event_type)
    ),
    r2 AS (
      SELECT event_type, dev,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY dev, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM d
    ),
    mad AS (SELECT event_type, dev AS mad_c FROM r2 WHERE rn = (n + 1) // 2)
    SELECT d.event_type,
           med.med_c AS median_cents,
           mad.mad_c AS mad_cents,
           COUNT(*)::BIGINT AS n_events,
           CAST(SUM(CASE WHEN d.dev > 3 * mad.mad_c THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM d JOIN med USING (event_type) JOIN mad USING (event_type)
    GROUP BY 1, 2, 3
    """,
)
def mad_outliers(spark, sf_dir):
    """Robust outlier gate via median/MAD (median absolute deviation)
    in integer CENTS — the quality filter that survives the heavy
    tails a mean/stddev z-score gate chokes on (one whale purchase
    inflates sigma and hides every other outlier; the median and MAD
    barely move). Both statistics are EXACT rank-based lower medians
    under a total order tie-broken by event_id (the
    grouped_median_filter recipe), and values live in cents, so the
    |x − median| > 3·MAD comparison is pure integer arithmetic the
    two engines cannot tie-split.

    Scale shape: two window passes partitioned by event_type (bounded
    key count; for a HOT type at 100 TB the same thresholds come from
    a two-pass count+offset rank read, identical join shape), each
    median relation is tiny and broadcasts back onto the scan, and
    the final classify is one hash aggregate. The narrow (type, id,
    cents) and (type, id, dev) frames each feed TWO branches (median
    + downstream), so both are materialized once behind an eager
    checkpoint — without the cut Spark re-plans the whole subtree per
    consumer (measured: 9 exchanges / 8 window ops vs 5 / 4 after;
    at 100 TB the un-cut plan re-SCANS events per branch, and the
    checkpoint is ~narrow-projection-sized, the standard trade this
    repo takes for every scanned-twice build)."""
    from pyspark.sql import Window as W

    ev = load_sdf(spark, sf_dir, "events")
    v = ev.select(
        "event_type", "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("c"),
    ).localCheckpoint(eager=True)

    def lower_median(df, col, out):
        w = W.partitionBy("event_type").orderBy(col, "event_id")
        wc = W.partitionBy("event_type")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .withColumn("n", F.count(F.lit(1)).over(wc))
            .filter(F.col("rn") == F.expr("(n + 1) div 2"))
            .select("event_type", F.col(col).alias(out))
        )

    med = lower_median(v, "c", "median_cents")
    d = v.join(F.broadcast(med), "event_type").select(
        "event_type", "event_id",
        F.abs(F.col("c") - F.col("median_cents")).alias("dev"),
    ).localCheckpoint(eager=True)
    mad = lower_median(d, "dev", "mad_cents")
    return (
        d.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "median_cents", "mad_cents")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(F.col("dev") > 3 * F.col("mad_cents"), 1)
                  .otherwise(0)).cast("long").alias("n_outliers"),
        )
    )
