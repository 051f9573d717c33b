"""Deduplication operators for large-scale corpus pipelines.

Four families, all shuffle-conscious and UDF-free (JVM-side expressions
only — higher-order array functions + hash aggregates):

- **exact**: hash-groupBy on a normalized-content fingerprint. One
  shuffle on the fingerprint; at 100 TB this is the standard
  "dedup by content hash" pass (fingerprints are uniform → no skew).
- **MinHash + LSH**: shingle → h32 → K permutations → per-doc
  signature; signatures cut into bands; docs sharing a band bucket are
  candidate near-dup pairs. Cost: one explode of distinct shingles
  (map-side), one groupBy(doc) for signatures, one groupBy(band bucket)
  self-join for candidates. The band join is the only pairwise step and
  touches only colliding buckets — the classic sub-quadratic near-dup
  design (Broder '97; Spark MLlib's MinHashLSH is the same idea, this
  one is oracle-reproducible).
- **SimHash**: per-token h32 → per-bit ±1 votes → 32-bit signature via
  one hash aggregate; near-dups share signature prefixes (bucket on
  the top bits).
- **n-gram Jaccard**: exact set similarity on blocked candidate pairs
  (block on cheap keys first; only in-block pairs are compared).

The reference has no dedup surface (SURVEY §2) — these are the
north-star extensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import NUM_HASHES, h32, h32_sql, minhash_perm, minhash_perm_sql
from .partitioning import barrier_width
from ..functions.text import (
    char_shingles,
    char_shingles_sql,
    fingerprint_md5,
    fingerprint_md5_sql,
    normalized,
    normalized_sql,
)

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct content fingerprint: the id to keep (min)
    and the number of copies."""
    return (
        docs.select(F.col(id_col), fingerprint_md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def exact_dedup_stats_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
    SELECT {fingerprint_md5_sql(text_col)} AS fp,
           MIN({id_col}) AS keep_id,
           COUNT(*) AS n_copies
    FROM {table}
    GROUP BY 1
    """


def drop_exact_dups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id representative of each content fingerprint.
    Implemented as min-id-per-fingerprint + semi-join (two shuffles on
    uniform keys; no window over the full corpus needed)."""
    fp = docs.withColumn("__fp", fingerprint_md5(F.col(text_col)))
    keep = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return fp.join(keep, [ "__fp", id_col], "left_semi").drop("__fp")


# ---------------------------------------------------------------------------
# MinHash signatures + LSH banding
# ---------------------------------------------------------------------------


def minhash_signature(text_col: Column, k: int = 3) -> list[Column]:
    """K minhash values: min over distinct shingles of perm_i(h32(s)).
    Stays inside one projection (transform + array_min per permutation)."""
    # hash each shingle ONCE (md5 is the expensive step), then apply the
    # 16 cheap arithmetic permutations to the precomputed hash array
    hashes = F.transform(char_shingles(text_col, k), lambda s: h32(s))

    def one(i: int) -> Column:
        # single-arg lambda: a 2-arg lambda would make F.transform pass
        # the element index as the second argument
        return F.array_min(F.transform(hashes, lambda h: minhash_perm(h, i)))

    return [one(i) for i in range(NUM_HASHES)]


def shingle_arrays(
    docs: DataFrame, keep_cols: list[str], text_col: str = "text", k: int = 3,
    out: str = "sh", parallelism: int | None = None,
) -> DataFrame:
    """Distinct k-shingle ARRAY per doc. Rows with len < k keep an
    empty array.

    Plan shape matters: the normalized text is materialized as a real
    column behind a repartition barrier BEFORE shingling, because
    Catalyst inlines cheap-looking aliases into HOF lambdas — without
    the barrier the regex normalization re-evaluates once per array
    element (O(len²) per doc). The repartition also spreads small
    single-file inputs across all cores; at 100 TB the barrier width
    follows the input split count (``barrier_width``) and the cost is
    one narrow shuffle of (id, normalized_text)."""
    norm = docs.select(
        *[F.col(c) for c in keep_cols], normalized(F.col(text_col)).alias("__t")
    )
    norm = norm.repartition(parallelism or barrier_width(norm))
    idx = F.sequence(F.lit(1), F.length("__t") - (k - 1))
    shingles = F.array_distinct(F.transform(idx, lambda i: F.substring(F.col("__t"), i, k)))
    guarded = F.when(F.length("__t") >= k, shingles).otherwise(F.array().cast("array<string>"))
    return norm.select(*[F.col(c) for c in keep_cols], guarded.alias(out))


def hashed_shingle_sets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3,
    materialize: bool = False,
) -> DataFrame:
    """One row per doc: the distinct hashed k-shingle set + its size —
    the single shared scan behind MinHash signatures, LSH banding, and
    exact-Jaccard verification (normalize → shingle → md5 is the
    expensive part of the whole dedup family; it should run once).

    With ``materialize=True`` the frame is eagerly localCheckpoint'd so
    every consumer (the signature projection AND both sides of the
    verify join) reads the materialized sets instead of re-deriving
    them; checkpointed storage is released by Spark's ContextCleaner
    once the frame is garbage-collected — unlike ``persist()``, which
    leaks across repeated calls unless manually unpersisted."""
    sets = shingle_arrays(docs, [id_col], text_col, k=k, out="sh")
    sets = sets.withColumn(
        "sh", F.array_distinct(F.transform(F.col("sh"), lambda s: h32(s)))
    ).withColumn("n_sh", F.size("sh"))
    return sets.localCheckpoint(eager=True) if materialize else sets


def minhash_signatures(
    docs: DataFrame | None = None, id_col: str = "doc_id", text_col: str = "text",
    bands: int = 4, rows_per_band: int = 4, sets: DataFrame | None = None,
) -> DataFrame:
    """Per-doc signature digest + band bucket keys.

    Computed entirely map-side from the per-doc hashed shingle set: one
    ``array_min(transform(...))`` per permutation — no explode and NO
    signature shuffle (the former explode→groupBy(id) shape hash-
    aggregated every (doc, shingle) row; at 100 TB that shuffle moves
    ~50 rows per doc for a result that is per-doc anyway). Docs with no
    shingles (len < k) have no signature — dropped, matching the
    oracle's unnest/inner-group semantics.

    Pass ``sets`` (from :func:`hashed_shingle_sets`) to share the
    shingle scan with other stages; otherwise it is derived from
    ``docs``."""
    assert bands * rows_per_band == NUM_HASHES
    if sets is None:
        sets = hashed_shingle_sets(docs, id_col, text_col)
    mins = [
        F.array_min(F.transform(F.col("sh"), lambda h: minhash_perm(h, i))).alias(f"m{i}")
        for i in range(NUM_HASHES)
    ]
    sig = sets.filter(F.col("n_sh") > 0).select(F.col(id_col), *mins)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"m{b * rows_per_band + r}").cast("string") for r in range(rows_per_band)]
        band_cols.append(F.md5(F.concat_ws(",", *parts)).alias(f"band{b}"))
    sig_digest = F.md5(F.concat_ws(",", *[F.col(f"m{i}").cast("string") for i in range(NUM_HASHES)]))
    return sig.select(F.col(id_col), sig_digest.alias("sig_md5"), *band_cols)


def minhash_signatures_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    bands: int = 4, rows_per_band: int = 4,
) -> str:
    mins = ",\n        ".join(
        f"MIN({minhash_perm_sql(h32_sql('s'), i)}) AS m{i}" for i in range(NUM_HASHES)
    )
    band_exprs = ",\n      ".join(
        "md5(concat_ws(','"
        + "".join(f", CAST(m{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band))
        + f")) AS band{b}"
        for b in range(bands)
    )
    sig_all = "concat_ws(','" + "".join(f", CAST(m{i} AS VARCHAR)" for i in range(NUM_HASHES)) + ")"
    return f"""
    WITH sh AS (
      SELECT {id_col}, unnest({char_shingles_sql(text_col)}) AS s
      FROM {table}
    ), sig AS (
      SELECT {id_col},
        {mins}
      FROM sh GROUP BY {id_col}
    )
    SELECT {id_col}, md5({sig_all}) AS sig_md5,
      {band_exprs}
    FROM sig
    """


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "doc_id", bands: int = 4
) -> DataFrame:
    """Distinct id pairs sharing ≥1 band bucket. The self-join is per
    band bucket (hash-partitioned on the bucket key), never all-pairs.

    Plan shape: one posexplode turns the signature row into (band_idx,
    bucket) rows in a single pass (a per-band union would re-run the
    whole signature pipeline once per band), and the bucket table is
    eagerly localCheckpoint'd so the self-join's two sides share one
    computation — without the cut Spark recomputes the subtree per side
    (17 shuffles observed vs 5 after). Checkpoint (not persist):
    ContextCleaner frees the storage once the frame is out of scope, so
    repeated calls in one session don't accumulate cached tables."""
    buckets = signatures.select(
        F.col(id_col),
        F.posexplode(F.array(*[F.col(f"band{b}") for b in range(bands)])).alias(
            "band_idx", "bucket"
        ),
    ).localCheckpoint(eager=True)
    left = buckets.select(F.col(id_col).alias("id_a"), "bucket", "band_idx")
    right = buckets.select(F.col(id_col).alias("id_b"), "bucket", "band_idx")
    pairs = left.join(right, ["bucket", "band_idx"]).filter(F.col("id_a") < F.col("id_b"))
    return pairs.select("id_a", "id_b").distinct()


def minhash_near_dups(
    docs: DataFrame,
    min_jaccard: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The canonical near-dedup pipeline end-to-end: MinHash → LSH
    banding → candidate pairs → EXACT Jaccard verification ≥ threshold.

    LSH prunes the pair space (only band-colliding pairs are verified);
    the verification join fetches each doc's hashed shingle set once and
    computes exact set overlap. At scale: candidates ∝ true near-dups
    (not n²), verification is an equi-join on id. The hashed shingle
    sets are computed ONCE (materialized) and shared between the
    signature stage and both sides of the verify join — normalize →
    shingle → md5 is the dominant cost and must not run three times."""
    sets = hashed_shingle_sets(docs, id_col, text_col, materialize=True)
    sigs = minhash_signatures(id_col=id_col, sets=sets)
    cand = lsh_candidate_pairs(sigs, id_col)
    a = sets.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"),
                    F.col("n_sh").alias("n_a"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"),
                    F.col("n_sh").alias("n_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.col("n_a") + F.col("n_b")).cast("double") - inter
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", F.round(inter / union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= min_jaccard)
    )


def minhash_near_dups_sql(table: str = "documents", min_jaccard: float = 0.6,
                          id_col: str = "doc_id", text_col: str = "text") -> str:
    from .similarity import N_PLANES  # noqa: F401  (doc cross-ref only)

    sig_sql = minhash_signatures_sql(table, id_col, text_col)
    shingle_hashed = (
        f"list_distinct(list_transform({char_shingles_sql(text_col)}, s -> {h32_sql('s')}))"
    )
    return f"""
    WITH sig AS ({sig_sql}),
    buckets AS (
      SELECT {id_col}, band0 AS bucket, 0 AS band_idx FROM sig
      UNION ALL SELECT {id_col}, band1, 1 FROM sig
      UNION ALL SELECT {id_col}, band2, 2 FROM sig
      UNION ALL SELECT {id_col}, band3, 3 FROM sig
    ),
    cand AS (
      SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
      FROM buckets a JOIN buckets b
        ON a.bucket = b.bucket AND a.band_idx = b.band_idx
       AND a.{id_col} < b.{id_col}
    ),
    sets AS (
      SELECT {id_col}, {shingle_hashed} AS sh FROM {table}
    )
    SELECT id_a, id_b,
           round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                 / (CAST(len(sa.sh) + len(sb.sh) AS DOUBLE)
                    - len(list_intersect(sa.sh, sb.sh))), 6) AS jaccard
    FROM cand
    JOIN sets sa ON sa.{id_col} = cand.id_a
    JOIN sets sb ON sb.{id_col} = cand.id_b
    WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                / (CAST(len(sa.sh) + len(sb.sh) AS DOUBLE)
                   - len(list_intersect(sa.sh, sb.sh))), 6) >= {min_jaccard}
    """


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash over distinct words: per-bit ±1 votes summed in a
    single hash aggregate (explode → groupBy(id) → 32 conditional sums)."""
    words = F.array_distinct(F.split(normalized(F.col(text_col)), " "))
    tok = docs.select(F.col(id_col), F.explode(words).alias("w")).filter(F.col("w") != "")
    tok = tok.select(id_col, h32(F.col("w")).alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    sig = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(2 ** b)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return agg.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    votes = ",\n        ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SIMHASH_BITS)
    )
    sig = " + ".join(f"(CASE WHEN v{b} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(SIMHASH_BITS))
    return f"""
    WITH tok AS (
      SELECT {id_col}, {h32_sql('w')} AS h FROM (
        SELECT {id_col},
               unnest(list_distinct(string_split({normalized_sql(text_col)}, ' '))) AS w
        FROM {table}
      ) WHERE w <> ''
    ), votes AS (
      SELECT {id_col},
        {votes}
      FROM tok GROUP BY {id_col}
    )
    SELECT {id_col}, CAST({sig} AS BIGINT) AS simhash
    FROM votes
    """


# ---------------------------------------------------------------------------
# blocked n-gram Jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    block_cols: list[str] | None = None, k: int = 3, min_jaccard: float = 0.0,
) -> DataFrame:
    """Exact Jaccard similarity of k-shingle sets for candidate pairs
    inside blocks (equi-join on block keys — never a full cross join)."""
    block_cols = block_cols or ["lang"]
    base = shingle_arrays(docs, [id_col, *block_cols], text_col, k, out="sh")
    # hash shingles to 32-bit ints once per doc: the per-pair
    # array_intersect then compares longs instead of strings (~3× in
    # practice). Jaccard is computed on the hashed sets on BOTH engines,
    # so any (rare, deterministic) collision affects both identically.
    base = base.withColumn(
        "sh", F.array_distinct(F.transform(F.col("sh"), lambda s: h32(s)))
    )
    # arrays are already distinct: |A ∪ B| = |A| + |B| - |A ∩ B| — one
    # hash-set build per pair instead of two
    base = base.withColumn("n_sh", F.size("sh"))
    a = base.select(
        F.col(id_col).alias("id_a"), *[F.col(c) for c in block_cols],
        F.col("sh").alias("sh_a"), F.col("n_sh").alias("n_a"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"), *[F.col(c) for c in block_cols],
        F.col("sh").alias("sh_b"), F.col("n_sh").alias("n_b"),
    )
    pairs = a.join(b, block_cols).filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.col("n_a") + F.col("n_b")).cast("double") - inter
    jac = F.round(inter / union, 6)
    out = pairs.select("id_a", "id_b", jac.alias("jaccard"))
    if min_jaccard > 0.0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out
