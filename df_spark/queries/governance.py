"""Data-governance queries (north-star LLM-pipeline extensions):
PII redaction and binary MIME sniffing.

The synthetic corpus contains no real PII or media headers, so both
queries INJECT deterministic instances in-plan (same expression tree on
the Spark and DuckDB sides) and then detect/redact them — the detection
logic reads the bytes/text, never the injection key, so a regex or
magic-table bug surfaces as a value mismatch, not a vacuous pass.

Scale: both are map-only (no shuffle until the final small rollup);
at 100 TB they run at scan speed with full column pruning — exactly how
a production PII scrubber or MIME classifier sits in an ingest pipeline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_sdf
from . import register

# conservative cross-engine regexes: character classes and bounded
# quantifiers only — identical semantics in Java regex (Spark) and RE2
# (DuckDB). No \d / \b shorthands, no backrefs.
_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "\\+1-555-[0-9]{4}"


@register(
    "pii_redact",
    sql=f"""
    WITH salted AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
      FROM documents
    ),
    red AS (
      SELECT doc_id,
             len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phones,
             regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                            '{_PHONE_RE}', '<PHONE>', 'g') AS clean
      FROM salted
    )
    SELECT doc_id, n_emails, n_phones, md5(clean) AS clean_md5,
           (NOT regexp_matches(clean, '{_EMAIL_RE}')
            AND NOT regexp_matches(clean, '{_PHONE_RE}')) AS is_clean
    FROM red
    """,
)
def pii_redact(spark, sf_dir):
    docs = load_sdf(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return salted.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(_PHONE_RE)).alias("n_phones"),
        F.md5(clean).alias("clean_md5"),
        (~clean.rlike(_EMAIL_RE) & ~clean.rlike(_PHONE_RE)).alias("is_clean"),
    )


# magic-byte table: first-4-bytes hex prefix -> container format.
# (JPEG/JFIF, PNG, RIFF — the real-world sniff order for image/audio
# ingest; everything else falls through to 'unknown'.)
_MAGICS = [("FFD8FFE0", "jpeg"), ("89504E47", "png"), ("52494646", "riff")]


@register(
    "mime_sniff",
    sql=f"""
    WITH media AS (
      SELECT doc_id AS media_id,
             unhex(CASE doc_id % 4 WHEN 0 THEN 'FFD8FFE0'
                                   WHEN 1 THEN '89504E47'
                                   WHEN 2 THEN '52494646'
                                   ELSE '' END) || encode(text) AS payload
      FROM documents
    )
    SELECT media_id,
           CASE substr(hex(payload), 1, 8)
                {' '.join(f"WHEN '{h}' THEN '{n}'" for h, n in _MAGICS)}
                ELSE 'unknown' END AS detected,
           octet_length(payload) AS n_bytes
    FROM media
    """,
)
def mime_sniff(spark, sf_dir):
    docs = load_sdf(spark, sf_dir, "documents")
    magic_hex = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("FFD8FFE0"))
        .when(F.col("doc_id") % 4 == 1, F.lit("89504E47"))
        .when(F.col("doc_id") % 4 == 2, F.lit("52494646"))
        .otherwise(F.lit(""))
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.unhex(magic_hex), F.encode(F.col("text"), "utf-8")).alias(
            "payload"
        ),
    )
    detected = F.hex(F.substring(F.col("payload"), 1, 4))
    expr = F.lit("unknown")
    for hexpfx, name in reversed(_MAGICS):
        expr = F.when(detected.startswith(hexpfx), F.lit(name)).otherwise(expr)
    return media.select(
        "media_id",
        expr.alias("detected"),
        F.length("payload").cast("long").alias("n_bytes"),
    )


# retention policy dim: days of history kept per event class (the
# bounded config table a real pipeline stores beside the data)
_RETENTION_DAYS = [("click", 7), ("view", 3), ("purchase", 30),
                   ("signup", 30), ("error", 14)]


@register(
    "retention_sweep",
    sql=f"""
    WITH pol(event_type, keep_days) AS (
      VALUES {', '.join(f"('{t}', {d})" for t, d in _RETENTION_DAYS)}
    ),
    mx AS (SELECT max(CAST(ts AS TIMESTAMP)) AS mt FROM events)
    SELECT e.event_type,
           SUM(CASE WHEN CAST(e.ts AS TIMESTAMP)
                         >= mx.mt - to_days(p.keep_days)
                    THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           SUM(CASE WHEN CAST(e.ts AS TIMESTAMP)
                         < mx.mt - to_days(p.keep_days)
                    THEN 1 ELSE 0 END)::BIGINT AS n_expired,
           epoch_us(MIN(CASE WHEN CAST(e.ts AS TIMESTAMP)
                                  >= mx.mt - to_days(p.keep_days)
                             THEN CAST(e.ts AS TIMESTAMP) END))
             AS oldest_kept_us
    FROM events e JOIN pol p USING (event_type), mx
    GROUP BY e.event_type
    """,
)
def retention_sweep(spark, sf_dir):
    """TTL / retention enforcement audit: each event class keeps a
    different history horizon (policy dim), the cutoff is anchored at
    the corpus max event time, and the sweep reports kept vs expired
    counts plus the oldest surviving timestamp per class — the
    dry-run every GDPR/TTL delete job emits before destructive
    compaction. The policy rides a broadcast join (bounded dim); the
    cutoff anchor stays fully IN-PLAN as a broadcast 1-row aggregate
    (the SQL oracle's ``mx`` CTE shape) rather than a collected
    scalar — no driver round-trip, and an empty events table yields
    zero rows instead of a None-literal error (r9 ADVICE). Interval
    arithmetic stays in exact microseconds on both engines (no ms
    flooring needed — this is batch, not a streaming watermark).

    Scale shape at 100 TB: the anchor pass scans only the pruned
    ``ts`` column (map-side-combined max); the expired predicate is
    partition-prunable when the table is date-partitioned (the
    production layout), so the sweep reads only boundary partitions;
    here it is one column-pruned anchor scan + one scan with a 5-key
    aggregate."""
    from ..sources.tables import load_sdf as _load
    ev = _load(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mt"))  # 1-row bounded aggregate
    pol = spark.createDataFrame(_RETENTION_DAYS, "event_type string, keep_days int")
    j = ev.join(F.broadcast(pol), "event_type").join(F.broadcast(mx))
    cutoff = F.col("mt") - F.col("keep_days") * F.expr("INTERVAL 1 DAY")
    kept = F.col("ts") >= cutoff
    return j.groupBy("event_type").agg(
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(kept, 0).otherwise(1)).cast("long").alias("n_expired"),
        F.unix_micros(F.min(F.when(kept, F.col("ts")))).alias("oldest_kept_us"),
    )


@register(
    "rtbf_cascade",
    sql="""
    WITH forget AS (
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 97 = 0
    ),
    fo AS (
      SELECT o.o_orderkey, o.o_totalprice, f.c_mktsegment
      FROM orders o JOIN forget f ON o.o_custkey = f.c_custkey
    ),
    agg_c AS (
      SELECT c_mktsegment, COUNT(DISTINCT c_custkey) AS n_customers
      FROM forget GROUP BY 1
    ),
    agg_o AS (
      SELECT c_mktsegment, COUNT(*) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS fv
      FROM fo GROUP BY 1
    ),
    agg_l AS (
      SELECT fo.c_mktsegment, COUNT(*) AS n_lineitems
      FROM lineitem l JOIN fo ON l.l_orderkey = fo.o_orderkey
      GROUP BY 1
    )
    SELECT c.c_mktsegment,
           c.n_customers::BIGINT AS n_customers,
           COALESCE(o.n_orders, 0)::BIGINT AS n_orders,
           COALESCE(l.n_lineitems, 0)::BIGINT AS n_lineitems,
           CAST(COALESCE(o.fv, 0) AS DOUBLE) AS frozen_value
    FROM agg_c c
    LEFT JOIN agg_o o USING (c_mktsegment)
    LEFT JOIN agg_l l USING (c_mktsegment)
    """,
)
def rtbf_cascade(spark, sf_dir):
    """Right-to-be-forgotten cascade audit: given a forget-set of
    customers (here the deterministic ``c_custkey % 97 = 0`` sample —
    in production, the DSAR queue), report per market segment how many
    customers, orders, and line items a hard delete would cascade to,
    plus the frozen order value — the dry-run every GDPR erasure job
    emits before destructive deletion, and the same plan shape the
    delete itself would use.

    Scale shape: the forget-set is bounded (thousands of keys against
    billions of rows), so it BROADCASTS into the orders scan — a
    map-side semi-join that prunes 1/97th of orders with zero shuffle
    on the fact side. The order->lineitem hop keys on o_orderkey; the
    forgotten-order set is too big to broadcast at 100 TB, so that hop
    is a shuffle equi-join on a uniform key (AQE picks broadcast
    locally). Final rollup is a 5-key aggregate.

    Oracle note: the per-segment aggregates are computed in separate
    branches then LEFT-joined (a segment whose forgotten customers
    have no orders still reports zeros) — mirrored exactly in the SQL.
    """
    cust = load_sdf(spark, sf_dir, "customer")
    orders = load_sdf(spark, sf_dir, "orders")
    li = load_sdf(spark, sf_dir, "lineitem")
    forget = (cust.filter(F.col("c_custkey") % 97 == 0)
              .select("c_custkey", "c_mktsegment"))
    fo = orders.join(
        F.broadcast(forget), orders.o_custkey == forget.c_custkey
    ).select("o_orderkey", "o_totalprice", "c_mktsegment")
    per_cust = forget.groupBy("c_mktsegment").agg(
        F.count_distinct("c_custkey").alias("n_customers"))
    per_ord = fo.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("__fv"),
    )
    per_li = (
        li.join(fo.select("o_orderkey", "c_mktsegment"),
                li.l_orderkey == fo.o_orderkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).cast("long").alias("n_lineitems"))
    )
    return (
        per_cust.join(per_ord, "c_mktsegment", "left")
        .join(per_li, "c_mktsegment", "left")
        .select(
            "c_mktsegment",
            F.col("n_customers").cast("long").alias("n_customers"),
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce("n_lineitems", F.lit(0)).cast("long")
            .alias("n_lineitems"),
            F.coalesce(F.col("__fv"), F.lit(0).cast("decimal(18,2)"))
            .cast("double").alias("frozen_value"),
        )
    )


# (table, pk expression cols, canonical content cols) — integer/string
# columns ONLY: float/timestamp-to-string rendering differs across
# engines, so the canonical row string sticks to types whose text form
# is identical (ints render bare, strings verbatim).
_MANIFEST_TABLES = [
    ("region", ["r_regionkey"], ["r_regionkey", "r_name"]),
    ("nation", ["n_nationkey"], ["n_nationkey", "n_name", "n_regionkey"]),
    ("customer", ["c_custkey"], ["c_custkey", "c_name", "c_mktsegment"]),
    ("supplier", ["s_suppkey"], ["s_suppkey", "s_name", "s_nationkey"]),
    ("orders", ["o_orderkey"],
     ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]),
    ("lineitem", ["l_orderkey", "l_linenumber"],
     ["l_orderkey", "l_linenumber", "l_partkey", "l_returnflag"]),
]


def _manifest_sql() -> str:
    from ..functions.hashing import h32_sql
    parts = []
    for t, pk, canon in _MANIFEST_TABLES:
        canon_expr = "concat_ws('|', " + ", ".join(
            f"CAST({c} AS VARCHAR)" for c in canon) + ")"
        pk_expr = " || '-' || ".join(f"CAST({c} AS VARCHAR)" for c in pk)
        parts.append(f"""
        SELECT '{t}' AS table_name,
               COUNT(*)::BIGINT AS n_rows,
               COUNT(DISTINCT {pk_expr})::BIGINT AS pk_distinct,
               SUM({h32_sql(canon_expr)})::BIGINT AS content_sum
        FROM {t}""")
    return " UNION ALL ".join(parts)


@register("dataset_manifest", sql=_manifest_sql())
def dataset_manifest(spark, sf_dir):
    """Dataset manifest / reproducibility card: for every input table,
    the row count, primary-key distinct count (a PK violation shows as
    pk_distinct < n_rows), and an ORDER-FREE content checksum — the
    SUM of a cross-engine 32-bit row hash over a canonical row string
    (md5-derived ``h32``, bit-identical in Spark and DuckDB; the sum
    of ≤2^32 values over ≤millions of rows stays far inside BIGINT).
    This is what a training run records next to its data snapshot so
    "same data?" is a 6-row comparison, not a 100 TB diff — and the
    same sum detects a corrupted/duplicated/dropped row after any
    migration, independent of row order or partitioning.

    Canonical strings use integer/string columns only: float and
    timestamp text renderings are engine-specific, so a manifest meant
    to be recomputed by heterogeneous engines pins its canon to types
    with one text form (the real-world cross-system checksum rule).

    Scale shape: one map-side-combined aggregate per table — each is a
    single scan emitting ONE row; the union is free. At 100 TB this is
    the cheapest full-scan audit that exists, and it parallelizes
    per-table."""
    from ..functions.hashing import h32
    outs = []
    for t, pk, canon in _MANIFEST_TABLES:
        df = load_sdf(spark, sf_dir, t)
        canon_col = F.concat_ws(
            "|", *[F.col(c).cast("string") for c in canon])
        pk_col = F.concat_ws("-", *[F.col(c).cast("string") for c in pk])
        outs.append(df.agg(
            F.lit(t).alias("table_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_distinct(pk_col).cast("long").alias("pk_distinct"),
            F.sum(h32(canon_col)).cast("long").alias("content_sum"),
        ))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
