"""Deduplication operators for large-scale corpus pipelines.

Four families, all shuffle-conscious. Declarative JVM-side expressions
(higher-order array functions + hash aggregates) by default; two
measured hot paths run as Arrow-vectorized ``mapInPandas`` stages
instead (the per-doc winnowing summary and the bounded-side MinHash
verify), each with the bit-exact declarative twin documented inline:

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
from pyspark.sql import types as T

from ..functions.hashing import NUM_HASHES, h32, h32_sql, minhash_perm, minhash_perm_sql
from ..plans.memo import FrameMemo, frame_key
from .partitioning import (
    BROADCAST_BYTES_CAP,
    barrier_width,
    checkpoint_spread,
    pandas_stage_width,
    size_hinted,
)
from ..functions.text import (
    char_shingles_sql,
    fingerprint_md5,
    fingerprint_md5_sql,
    normalized,
    normalized_sql,
)

# Session-scoped memo of the expensive shared intermediates (the
# reference's Pool, src/pool.rs:25-94, at operator granularity): the
# narrow MinHash profile and the verified near-dup pair set are each
# derived identically by several registry queries (dedup_clusters,
# llm_data_pipeline, minhash_near_dups, minhash_signatures,
# minhash_lsh_pairs) — within a session the first caller computes, the
# rest hit materialized storage.
# Capacity 16 (was 8 through r9): the r10 registry's per-pass memo
# traffic (shared build + sets + cand + bench_hashes + prefix/
# containment xxsets/xxarrays + rarity + fuzzy blocks + the estimator
# audit) exceeded 8 live keys, so the prefix family's xxsets/xxarrays —
# built once per pass by containment_join — were LRU-evicted before
# prefix_sim_join ran, re-paying a 2.4 s build (measured: bench prefix
# wall 2.07 → 4.46 s, CPU 8.9 → 28). Entries are localCheckpoint'd
# narrow intermediates; ContextCleaner frees evicted ones, so the cost
# of a larger window is bounded storage references, not leaks.
DEDUP_MEMO = FrameMemo(capacity=16)

# hashed shingle SETS are stored as 32-bit ints, shifted from the h32
# domain [0, 2^32) by -2^31 (injective → Jaccard-invariant); profiles
# shift back before applying MinHash permutations
H32_INT_SHIFT = 2_147_483_648


def minhash_mins_array() -> Column:
    """The 16 per-doc minima as ONE array column (same bytes as 16 long
    columns, a third of the per-row field handling through joins)."""
    return F.array(*[F.col(f"m{i}") for i in range(NUM_HASHES)])


def minhash_est(mins_left: str, mins_right: str) -> Column:
    """Estimated signature agreement: a 16-term sum of per-position
    equality flags via ``getItem`` — fully codegen'd integer compares.
    (The r3-r5 ``zip_with``/``aggregate`` HOF form evaluated its lambda
    INTERPRETED per pair: measured 40 → 18 CPU-s on the 2.3 M-pair
    sf0.1 screen just from this rewrite.) Shared by the in-corpus and
    cross-corpus verifies."""
    est = None
    for i in range(NUM_HASHES):
        term = F.when(
            F.col(mins_left).getItem(i) == F.col(mins_right).getItem(i), 1
        ).otherwise(0)
        est = term if est is None else est + term
    return est


def jaccard_projection(
    pairs: DataFrame, id_left: str, id_right: str,
    sh_left: str, sh_right: str, min_jaccard: float,
) -> DataFrame:
    """(id_left, id_right, jaccard >= t) from per-pair shingle arrays.
    The intersect size materializes ONCE in its own projection —
    referencing it twice inside the jaccard expression would re-evaluate
    the intersect per use whenever codegen subexpression elimination is
    off. Shared by the in-corpus and cross-corpus verifies."""
    sized = pairs.select(
        id_left, id_right,
        F.size(F.array_intersect(sh_left, sh_right)).cast("double").alias("__i"),
        (F.size(sh_left) + F.size(sh_right)).cast("double").alias("__t"),
    )
    jac = F.round(F.col("__i") / (F.col("__t") - F.col("__i")), 6)
    return (
        sized.select(id_left, id_right, jac.alias("jaccard"))
        .filter(F.col("jaccard") >= min_jaccard)
    )

def jaccard_words_projection(
    pairs: DataFrame, id_left: str, id_right: str,
    left_suffix: str, right_suffix: str, words: list[str], min_jaccard: float,
    carry: list[str] | None = None,
) -> DataFrame:
    """(id_left, id_right, jaccard >= t) from per-pair shingle BITMAPS
    (``w{{i}}{{suffix}}`` long columns, one bit per distinct shingle
    hash): |∩| = Σ popcount(wa & wb) — W codegen'd ANDs + bit_counts
    per pair instead of a per-pair hash-set build (measured ~10× at
    sf0.1 where W=6). Set sizes ride along as ``n{{suffix}}`` columns.
    Bit-exact with :func:`jaccard_projection`: bits are per distinct
    h32 value, so popcounts equal hash-set cardinalities.

    ``carry`` columns survive the projection (still present after the
    threshold filter) so callers can apply further conjuncts — e.g.
    the MinHash-estimate screen, which on the bitmap path is CHEAPER
    evaluated after this filter (6 popcounts vs a 16-term compare,
    2.3 M pairs in, 0.4 M out at sf0.1)."""
    inter = None
    for w in words:
        term = F.bit_count(
            F.col(f"{w}{left_suffix}").bitwiseAND(F.col(f"{w}{right_suffix}")))
        inter = term if inter is None else inter + term
    sized = pairs.select(
        id_left, id_right, *(carry or []),
        inter.cast("double").alias("__i"),
        (F.col(f"n{left_suffix}") + F.col(f"n{right_suffix}")).cast("double").alias("__t"),
    )
    jac = F.round(F.col("__i") / (F.col("__t") - F.col("__i")), 6)
    return (
        sized.select(id_left, id_right, *(carry or []), jac.alias("jaccard"))
        .filter(F.col("jaccard") >= min_jaccard)
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


def shingle_hashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3,
) -> DataFrame:
    """(id, h) rows: one 32-bit hash per distinct k-shingle per doc.

    Two plan-shape rules are load-bearing here:

    - the hash (md5-derived) is applied AFTER the explode so it runs in
      whole-stage codegen — hashing inside a ``transform`` lambda
      executes interpreted, per element (measured ~10× slower at sf0.1
      for identical work);
    - the explode's input is the shingle EXPRESSION, not a pre-aliased
      column: ``InferFiltersFromGenerate`` skips expensive expression
      children (SPARK-36715) but fires on attributes, and the inferred
      ``size(col) > 0`` filter then gets alias-substituted by predicate
      pushdown and lands below the repartition barrier — re-running the
      whole normalize+shingle tree on the raw scan, per row, in its
      un-barriered O(len²) form (measured 26 s vs 0.7 s at sf0.1)."""
    norm = docs.select(
        F.col(id_col), normalized(F.col(text_col)).alias("__t")
    ).filter(F.length("__t") >= k)
    norm = norm.repartition(barrier_width(norm))
    idx = F.sequence(F.lit(1), F.length("__t") - (k - 1))
    shingled = norm.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.transform(idx, lambda i: F.substring(F.col("__t"), i, k)))
        ).alias("__s"),
    )
    return shingled.select(F.col(id_col), h32(F.col("__s")).alias("h"))


def shingle_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3,
) -> DataFrame:
    """Per-doc NARROW MinHash profile (id + NUM_HASHES permutation
    minima — 16 longs/doc) in ONE codegen hash-aggregate over the
    exploded shingle hashes. Map-side partial aggregation collapses a
    doc's shingle rows before they move (doc rows land co-partitioned
    behind the shingle barrier), so the shuffle carries ~one partial
    row per doc, not one row per shingle.

    Deliberately narrow: round 2 packed the hashed shingle SETS into
    this same aggregate (``collect_set``), which (a) pushed every
    doc's full shingle set through the shuffle inside the partial
    aggregates and (b) made every narrow consumer of the checkpoint
    (signature projection, estimate prefilter) pay KB-per-row array
    deserialization for a column it never read — the round-2 bench
    regression. Verification sets now come from the map-side-only
    :func:`hashed_shingle_sets` and never enter an aggregate."""
    hashes = shingle_hashes(docs, id_col, text_col, k=k)
    aggs = [F.min(minhash_perm(F.col("h"), i)).alias(f"m{i}") for i in range(NUM_HASHES)]
    return hashes.groupBy(id_col).agg(*aggs)


# Max distinct shingle hashes for the bitmap verify encoding: 4096 bits
# = 64 longs per doc. Char-k-shingle universes are bounded by charset^k
# (a few hundred on normalized closed-vocab corpora, ≤ ~64k for ASCII
# text at k=3), so the cap decides per-BUILD from the measured dim size
# — never per-row.
BITMAP_MAX_WORDS = 64
# Past this many distinct shingles the dictionary join stops paying
# (dim no longer broadcast-trivial) and the build falls back to the
# per-row transform path.
DIM_MAX_ROWS = 1_000_000


def _shared_build(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3,
    memo: bool = True, plan_probe: list | None = None,
) -> DataFrame:
    """ONE-aggregate build of everything the dedup family derives from
    text: per-doc hashed shingle set (``sh``), its size (``n_sh``), the
    16 MinHash minima (``m0..m15``), and — when the corpus' distinct-
    shingle-hash universe fits ``BITMAP_MAX_WORDS``×64 bits — a fixed-
    width bitmap (``w0..w{{W-1}}``) with one bit per distinct h32 value,
    which turns the per-pair exact-Jaccard intersect into W ANDs +
    popcounts instead of a hash-set build (measured ~10× at sf0.1).

    Plan shape (replaces the r2–r5 two-pass transform build, 50→~20
    CPU-s at sf0.1):

    - normalize once behind the barrier repartition, checkpoint the
      (id, normalized text) frame — it is scanned twice (dictionary +
      aggregate). At 100 TB this materialization is ~input-sized; the
      alternative (recompute the normalize per pass) trades CPU for
      storage and stays a one-line change.
    - shingle via ``posexplode of positions`` + ``substring`` AFTER the
      explode — whole-stage codegen end to end; the old
      ``transform``-lambda path evaluated substring+md5 interpreted,
      per element.
    - h32 (md5) and the 16 permutations are computed once per DISTINCT
      shingle on a dictionary frame bounded by charset^k — broadcast
      back onto the token stream. Duplicate positions don't matter:
      ``collect_set`` dedupes, MIN and bit_or are idempotent.
    - ONE hash aggregate per doc builds sets + mins + bitmap together;
      map-side partial aggregation collapses each doc's tokens before
      the (tiny: ints + 16 longs per doc) shuffle.

    Bit indexing is per distinct ``h32`` value (dense_rank), not per
    shingle string, so two shingles colliding on h32 share a bit and
    popcounts equal hash-set cardinalities exactly — the oracle's
    ``list_intersect`` on hashes sees identical numbers.

    Contract difference vs :func:`hashed_shingle_sets`: docs whose
    normalized text is shorter than ``k`` produce NO row (they have no
    signature and can never be LSH candidates, so every consumer joins
    them away anyway)."""
    def build() -> DataFrame:
        norm = docs.select(
            F.col(id_col), normalized(F.col(text_col)).alias("__t")
        ).filter(F.length("__t") >= k)
        # the eager checkpoint IS the materialization barrier; only
        # spread when the input would materialize narrow (r13 — the
        # load-time scan spread already fans the corpus out, making the
        # old unconditional round-robin barrier a redundant shuffle of
        # the whole normalized corpus)
        norm = checkpoint_spread(norm).localCheckpoint(eager=True)
        toks = norm.select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), F.length("__t") - (k - 1))).alias("__p"),
            "__t",
        ).select(F.col(id_col), F.col("__t").substr(F.col("__p"), F.lit(k)).alias("__s"))

        # ONE pass over the token stream builds the dictionary; the
        # checkpoint makes every later dim read (stats agg, broadcast
        # build) a bounded-table scan instead of a corpus re-explode
        dim = (
            toks.select("__s").distinct()
            .select("__s", h32(F.col("__s")).alias("__h"))
            .localCheckpoint(eager=True)
        )
        stats = dim.agg(
            F.count(F.lit(1)).alias("n_tri"),
            F.countDistinct("__h").alias("n_hashes"),
        ).collect()[0]
        n_tri = stats["n_tri"]
        if n_tri > DIM_MAX_ROWS:
            # unbounded shingle universe: dictionary join stops paying —
            # per-row transform build, no bitmap
            sets = hashed_shingle_sets(docs, id_col, text_col, k=k)
            h = (F.col("h").cast("long") + H32_INT_SHIFT).alias("h")
            hashes = sets.select(F.col(id_col), F.explode("sh").alias("h")).select(id_col, h)
            prof = hashes.groupBy(id_col).agg(
                *[F.min(minhash_perm(F.col("h"), i)).alias(f"m{i}")
                  for i in range(NUM_HASHES)])
            return (
                sets.filter(F.size("sh") > 0)
                .withColumn("n_sh", F.size("sh"))
                .join(prof, id_col)
                .localCheckpoint(eager=True)
            )

        from pyspark.sql import Window

        n_hashes = stats["n_hashes"]
        n_words = (
            (n_hashes + 63) // 64 if n_hashes <= BITMAP_MAX_WORDS * 64 else 0
        )
        dim_cols = [
            "__s",
            *[minhash_perm(F.col("__h"), i).alias(f"p{i}") for i in range(NUM_HASHES)],
        ]
        if n_words:
            # single-partition window is fine: the dim is charset^k-bounded
            dim_cols.append(
                (F.dense_rank().over(Window.orderBy("__h")) - 1).alias("__bit"))
        else:
            # the explicit hash only rides along when sets are arrays
            dim_cols.insert(1, (F.col("__h") - H32_INT_SHIFT).cast("int").alias("hi"))
        # no second checkpoint: the broadcast build below evaluates the
        # perm/bit projection once off the dim checkpoint
        dim = dim.select(*dim_cols)
        if n_words:
            # word index + bit mask precomputed ONCE per distinct
            # shingle on the dictionary: the per-token bit_or aggregate
            # expressions below then reduce to one equality compare
            # each instead of a range test + shiftleft (4x less hot-
            # path work across n_words exprs x every token row); __bit
            # itself never reaches the token join
            dim = dim.select(
                "__s", *[f"p{i}" for i in range(NUM_HASHES)],
                F.expr("__bit div 64").alias("__wi"),
                F.expr("shiftleft(1L, __bit % 64)").alias("__mask"))

        # in the bitmap regime the explicit hash ARRAYS are dead weight:
        # every in-build consumer (verify, in-table cross, stats) reads
        # the words + n_sh; arrays for the rare two-frame cross API come
        # from :func:`shared_sets`' separate lazy build instead. The
        # collect_set buffer was ~40% of this aggregate's cost.
        # n_sh is NOT aggregated here: countDistinct alongside plain
        # aggs makes Catalyst plan an Expand that runs every token row
        # through the aggregate twice (measured r7: ~30% of the build's
        # CPU). The set bits ARE the distinct h32 count, so n_sh is a
        # post-agg popcount sum (bitmap regime) / array size (set
        # regime) instead.
        aggs = [
            *[F.min(f"p{i}").alias(f"m{i}") for i in range(NUM_HASHES)],
        ]
        if n_words:
            for w in range(n_words):
                aggs.append(F.expr(
                    f"bit_or(CASE WHEN __wi = {w} THEN __mask ELSE 0L END)"
                ).alias(f"w{w}"))
            n_sh = sum(F.bit_count(f"w{w}") for w in range(n_words))
        else:
            aggs.insert(0, F.collect_set("hi").alias("sh"))
            n_sh = F.size("sh")
        head = ["sh"] if not n_words else []
        combined = (
            toks.join(F.broadcast(dim), "__s")
            .groupBy(id_col)
            .agg(*aggs)
            .select(
                id_col, *head, n_sh.cast("int").alias("n_sh"),
                *[f"m{i}" for i in range(NUM_HASHES)],
                *[f"w{w}" for w in range(n_words)],
            )
        )
        if plan_probe is not None:
            # expose the pre-checkpoint physical plan so tests can pin
            # the broadcast-dictionary regime (checkpointing erases it)
            plan_probe.append(
                combined._jdf.queryExecution().executedPlan().toString())
        return combined.localCheckpoint(eager=True)

    if not memo:
        return build()
    key = ("combined", frame_key(docs), id_col, text_col, k)
    return DEDUP_MEMO.get_or_build(key, build)


def _build_words(frame: DataFrame) -> list[str]:
    """Bitmap word columns present on a :func:`_shared_build` frame
    (empty when the universe exceeded the bitmap cap)."""
    import re

    return sorted(
        (c for c in frame.columns if re.fullmatch(r"w\d+", c)),
        key=lambda c: int(c[1:]),
    )


def shared_sets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3,
    memo: bool = True,
) -> DataFrame:
    """Per-doc hashed shingle ARRAYS, memoized. When the shared build
    ran in the array regime this is a slice of it; in the bitmap regime
    the hot path never materializes arrays, so this builds them lazily
    (one extra map-side corpus pass, :func:`hashed_shingle_sets`) for
    the callers that genuinely need per-element sets — the two-frame
    cross-corpus verify, ad-hoc analysis. Keeps that function's
    contract: one row per doc, empty array for texts shorter than
    ``k``."""
    combined = _shared_build(docs, id_col, text_col, k, memo=memo)
    if "sh" in combined.columns:
        return combined.select(id_col, "sh")
    if not memo:
        return hashed_shingle_sets(docs, id_col, text_col, k=k).localCheckpoint(eager=True)
    key = ("sets", frame_key(docs), id_col, text_col, k)
    return DEDUP_MEMO.get_or_build(
        key,
        lambda: hashed_shingle_sets(docs, id_col, text_col, k=k).localCheckpoint(eager=True),
    )


def shared_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3,
    memo: bool = True,
) -> DataFrame:
    """Per-doc narrow MinHash profile (id + 16 minima) slice of
    :func:`_shared_build` — memoized; the minima come from permutations
    applied on the shingle DICTIONARY (once per distinct shingle, in
    the oracle-reproducible h32 domain), min-aggregated per doc in the
    same pass that builds the sets. Docs with no shingles (len < k)
    have no row, matching the oracle's unnest/inner-group semantics."""
    return _shared_build(docs, id_col, text_col, k, memo=memo).select(
        id_col, *[f"m{i}" for i in range(NUM_HASHES)])


def hashed_shingle_sets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3,
) -> DataFrame:
    """(id, sh): the distinct hashed k-shingle set per doc as an array
    column, MAP-SIDE ONLY — normalize → one ``transform`` lambda
    computing substring+hash per position → ``array_distinct``. No
    explode, no aggregate: the sets never pass through a shuffle; the
    only exchange is the narrow (id, normalized-text) barrier
    repartition. Equal to ``collect_set`` of post-explode hashes
    (distinct-of-hashes == hashes-of-distinct), but the per-pair verify
    join downstream can broadcast the small candidate side against
    this frame and read it in place.

    The hashes are stored SHIFTED to 32-bit ints (``h32 - 2^31``, an
    injective map, so intersect/union cardinalities — and therefore
    Jaccard — are unchanged): the verify join's dominant costs are
    copying the arrays through the join and the per-pair hash-set
    build, and ints halve the bytes and hit ArrayIntersect's
    specialized int path. :func:`shared_profile` adds the offset back
    when deriving MinHash permutations, so signatures stay defined
    over the oracle-reproducible ``h32`` domain.

    No ``size(sh)`` column here: referencing the array expression twice
    in one projection would inline (and re-evaluate) the whole
    interpreted transform per use — consumers take ``F.size`` on the
    materialized column instead."""
    norm = docs.select(F.col(id_col), normalized(F.col(text_col)).alias("__t"))
    norm = norm.repartition(barrier_width(norm))
    idx = F.sequence(F.lit(1), F.length("__t") - (k - 1))
    hashed = F.array_distinct(F.transform(
        idx, lambda i: (h32(F.substring(F.col("__t"), i, k)) - H32_INT_SHIFT).cast("int")
    ))
    guarded = F.when(F.length("__t") >= k, hashed).otherwise(F.array().cast("array<int>"))
    return norm.select(F.col(id_col), guarded.alias("sh"))


def _bands_from_mins(sig: DataFrame, id_col: str, bands: int, rows_per_band: int) -> DataFrame:
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"m{b * rows_per_band + r}").cast("string") for r in range(rows_per_band)]
        band_cols.append(F.md5(F.concat_ws(",", *parts)).alias(f"band{b}"))
    sig_digest = F.md5(F.concat_ws(",", *[F.col(f"m{i}").cast("string") for i in range(NUM_HASHES)]))
    return sig.select(F.col(id_col), sig_digest.alias("sig_md5"), *band_cols)


def minhash_signatures(
    docs: DataFrame | None = None, id_col: str = "doc_id", text_col: str = "text",
    bands: int = 4, rows_per_band: int = 4, profile: DataFrame | None = None,
    memo: bool = True,
) -> DataFrame:
    """Per-doc signature digest + band bucket keys, from the single-
    aggregate :func:`shingle_profile`. Docs with no shingles (len < k)
    have no signature — dropped, matching the oracle's unnest/
    inner-group semantics (the explode produces no row for them).

    Pass ``profile`` to share one profile aggregate with other stages
    (near-dup verification); otherwise the session-memoized
    :func:`shared_profile` is used, so signatures/LSH/near-dup queries
    in one session derive from a single materialized aggregate."""
    assert bands * rows_per_band == NUM_HASHES
    if profile is None:
        profile = shared_profile(docs, id_col, text_col, memo=memo)
    return _bands_from_mins(profile, id_col, bands, rows_per_band)


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
    signatures: DataFrame, id_col: str = "doc_id", bands: int = 4,
    memo: bool = True,
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
    repeated calls in one session don't accumulate cached tables.

    The distinct pair set is session-memoized (``minhash_lsh_pairs``
    and every near-dup/cluster/pipeline query need exactly this frame;
    signatures built from the memoized profile hash to the same key)."""
    def build() -> DataFrame:
        buckets = signatures.select(
            F.col(id_col),
            F.posexplode(F.array(*[F.col(f"band{b}") for b in range(bands)])).alias(
                "band_idx", "bucket"
            ),
        ).localCheckpoint(eager=True)
        # bucket rows are (id, 4B idx, 32B digest) — measure and
        # broadcast one self-join side when bounded (checkpoints carry
        # no stats, so the planner alone would shuffle both sides)
        buckets_bytes = buckets.count() * 64
        left = buckets.select(F.col(id_col).alias("id_a"), "bucket", "band_idx")
        right = size_hinted(
            buckets.select(F.col(id_col).alias("id_b"), "bucket", "band_idx"),
            buckets_bytes)
        pairs = left.join(right, ["bucket", "band_idx"]).filter(F.col("id_a") < F.col("id_b"))
        return pairs.select("id_a", "id_b").distinct().localCheckpoint(eager=True)

    if not memo:
        return build()
    key = ("cand", frame_key(signatures), id_col, bands)
    return DEDUP_MEMO.get_or_build(key, build)


MIN_EST_MATCHES = 5  # of NUM_HASHES — MinHash-estimate prefilter floor


def minhash_near_dups(
    docs: DataFrame,
    min_jaccard: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_est_matches: int = MIN_EST_MATCHES,
    memo: bool = True,
) -> DataFrame:
    """The canonical near-dedup pipeline end-to-end: MinHash → LSH
    banding → candidate pairs → signature-estimate prefilter → EXACT
    Jaccard verification ≥ threshold.

    LSH prunes the pair space (only band-colliding pairs are verified),
    but a dense dup cluster still floods the candidate set (2.3 M pairs
    at sf0.1 here). Verifying each candidate means attaching both docs'
    hashed shingle sets (KBs per row) — so candidates are first
    screened by the MinHash Jaccard ESTIMATE (count of equal signature
    mins ≥ ``min_est_matches``), whose payload is 16 longs per doc, and
    only survivors pay the set-attaching verify join. The prefilter is
    deterministic (md5-derived mins) and applied identically in the SQL
    oracle, so both engines compute the same result set: pairs with
    estimate ≥ floor AND exact Jaccard ≥ threshold. The default floor
    (5/16 ≈ 0.31) sits ~2.5σ below a true Jaccard of 0.6 (binomial
    n=16 p=0.6 → P(X<5) ≈ 0.4%), standard LSH-verify practice.
    Recall note: a true near-dup pair (exact J ≥ threshold) whose
    signature estimate falls below the floor is dropped (~0.4% at
    j=0.6, worse just above threshold); callers that need the unscreened
    contract pass ``min_est_matches=0``.

    Plan shape (the round-2/3/4 lessons, rebuilt on the round-6
    dictionary build): ONE memoized corpus aggregate
    (:func:`_shared_build`) yields the narrow MinHash profile
    (signatures + prefilter) AND the verification payload — bitmap
    words when the shingle universe fits, hash arrays otherwise. The
    verify strategy is then ADAPTIVE on the runtime-measured side
    sizes (checkpoints carry no Catalyst stats, so the operator
    measures with one cheap agg and decides itself):

    - **fused** (sides fit ``BROADCAST_BYTES_CAP``): one codegen stage
      — candidates repartitioned to ~100k pairs/task, both sides'
      payloads attached via two broadcast hash joins, prefilter and
      exact Jaccard evaluated in the same stage (on the bitmap path
      the cheap popcount threshold runs before the 16-term estimate;
      on the array path the estimate screens first so rejected pairs
      never evaluate the hash-set intersect). Screened-out pairs cost
      only in-stage CPU, never a materialization (2.3 M candidates at
      sf0.1, 99.95 % of which pass the screen — a prefilter
      materialization buys nothing when the candidate set is this
      dense).
    - **two-phase** (sides exceed the cap — the 100 TB regime, where
      the sets frame is corpus-sized and every join shuffles): screen
      the candidates against the NARROW mins first (16 longs/doc
      through the shuffle, not KB arrays), checkpoint + count the
      survivors, then pay the array-attaching shuffle join only for
      them. When the screen is selective (sparse corpora — the
      production case, unlike the dense synthetic sf0.1 corpus) this
      avoids shuffling shingle arrays for pairs the estimate already
      rejects.

    Both branches size the pair-stream repartition to the measured
    pair count (fused: ~100k light bitmap pairs/task; two-phase: ~20k
    array-carrying pairs/task; both capped at 8× parallelism) — the
    pair frame otherwise inherits ~10 post-join partitions from
    upstream (measured 12.2 s vs 3.0 s at sf0.1).

    With ``memo=True`` the verified pair set itself is session-memoized
    (eager checkpoint, re-partitioned to data-sized width so downstream
    consumers don't inherit the verify job's task count):
    ``dedup_clusters``, ``llm_data_pipeline`` and ``minhash_near_dups``
    all need exactly this frame."""

    def build() -> DataFrame:
        combined = _shared_build(docs, id_col, text_col, memo=memo)
        words = _build_words(combined)
        prof = combined.select(id_col, *[f"m{i}" for i in range(NUM_HASHES)])
        par = docs.sparkSession.sparkContext.defaultParallelism
        # one cheap agg over the materialized build checkpoint: ~8 B per
        # hash + per-row overhead; drives both the broadcast decision
        # and the per-doc payload size estimate
        stats = combined.select(
            F.count(F.lit(1)).alias("n"), F.sum("n_sh").alias("nh")
        ).collect()[0]
        n_docs = stats["n"]
        mins_bytes = n_docs * (NUM_HASHES * 8 + 24)
        if words:
            # bitmap payload: W longs + n_sh per doc
            pay_cols = [F.col("n_sh"), *[F.col(w) for w in words]]
            pay_bytes = n_docs * (len(words) + 1) * 8 + n_docs * 24
        else:
            pay_cols = [F.col("n_sh"), F.col("sh")]
            pay_bytes = (stats["nh"] or 0) * 4 + n_docs * 32

        mins_arr = minhash_mins_array()
        est = minhash_est("mins_a", "mins_b")

        def sided(suffix: str) -> list:
            return [
                F.col("n_sh").alias(f"n{suffix}"),
                *([F.col(w).alias(f"{w}{suffix}") for w in words] if words
                  else [F.col("sh").alias(f"sh{suffix}")]),
            ]

        def verify(pairs: DataFrame) -> DataFrame:
            if words:
                return jaccard_words_projection(
                    pairs, "id_a", "id_b", "_a", "_b", words, min_jaccard)
            return jaccard_projection(
                pairs, "id_a", "id_b", "sh_a", "sh_b", min_jaccard)

        side = combined.select(F.col(id_col), mins_arr.alias("mins"), *pay_cols)
        if words and pay_bytes + mins_bytes < BROADCAST_BYTES_CAP:
            # FUSED BANDED VERIFY (r8, bitmap regime): candidates are
            # never materialized JVM-side at all. r8's first cut still
            # shipped the 2.3 M candidate pairs THROUGH Arrow into the
            # numpy gather, and the transfer itself — not the popcount
            # math — turned out to be the cost (measured: an IDENTITY
            # mapInPandas/mapInArrow over the candidate frame is ~18-24
            # CPU-s at sf0.1 under the C1 bench JIT; the numpy verify
            # inside is ~2). Everything the banding join derives is a
            # pure function of the broadcast side table (16 minima per
            # doc), so each task re-derives the LSH buckets it OWNS
            # from the broadcast minima instead: lexsort the band's 4
            # minima columns, split groups, keep buckets hashing to
            # this task id, enumerate id_a < id_b pairs per bucket
            # (vectorized per bucket-size class), drop pairs that
            # already share an EARLIER band (exact min-band dedup — a
            # pair is emitted by exactly one bucket globally, so no
            # JVM-side distinct), then screen + popcount-verify in the
            # same array pass. Input: one row per task id; output:
            # verified integers only.
            #
            # Bucket semantics match lsh_candidate_pairs exactly: two
            # docs share band b iff their 4 minima tuples are equal
            # (the md5 band digest is injective on the tuple), and the
            # oracle's DISTINCT-pair + estimate-floor + exact-Jaccard
            # contract is evaluated on the same integers. EXACTNESS of
            # the emitted rows is the r8 gather argument verbatim: the
            # UDF emits only exact integers (|∩| and na+nb) screened by
            # the exact integer estimate floor and a CONSERVATIVE
            # raw-ratio screen (margin 1e-6 > the 5e-7 half-ulp a
            # rounded value can move); the authoritative
            # round-then-threshold runs JVM-side with the identical
            # double expression as jaccard_words_projection.
            #
            # 100 TB note: this regime is, by construction, the
            # bounded-corpus one (the whole side table must fit the
            # broadcast cap); past the cap the two-phase JVM path below
            # is unchanged and fully distributed.
            import numpy as np

            mcols = [f"m{i}" for i in range(NUM_HASHES)]
            pside = (
                combined.select(F.col(id_col), F.col("n_sh"), *words, *mcols)
                .toPandas()
                .sort_values(id_col)
            )
            ids_np = np.ascontiguousarray(pside[id_col].to_numpy(np.int64))
            n_np = np.ascontiguousarray(pside["n_sh"].to_numpy(np.int64))
            words_np = np.ascontiguousarray(
                pside[list(words)].to_numpy(np.int64)
            ).view(np.uint64)
            mins_np = np.ascontiguousarray(pside[mcols].to_numpy(np.int64))
            bc = docs.sparkSession.sparkContext.broadcast(
                (ids_np, n_np, words_np, mins_np)
            )
            raw_floor = float(min_jaccard) - 1e-6
            est_floor = int(min_est_matches)
            # tasks scale with corpus size (each re-derives the banding
            # over the broadcast minima — trivial next to enumeration),
            # NOT fixed at full parallelism: a fresh python worker
            # costs ~0.7-2.5 CPU-s of interpreter+import spin-up, which
            # at 32 tasks would dwarf the ~3 CPU-s of actual numpy work
            # on a 5k-doc corpus
            n_parts = max(1, min(par, n_docs // 600 + 1))
            bands, rpb = 4, NUM_HASHES // 4  # lsh_candidate_pairs defaults

            def gen(batches):
                import numpy as np
                import pyarrow as pa

                ids, nsz, wbits, mins = bc.value
                pop8 = np.unpackbits(
                    np.arange(256, dtype=np.uint8)[:, None], axis=1
                ).sum(axis=1).astype(np.int64)
                CHUNK = 1 << 19  # pairs per enumeration slice (memory cap)

                def band_pairs(pid):
                    if len(mins) < 2:
                        return
                    for band in range(bands):
                        sub = mins[:, band * rpb:(band + 1) * rpb]
                        order = np.lexsort(sub.T[::-1])
                        srt = sub[order]
                        brk = np.flatnonzero(
                            np.any(srt[1:] != srt[:-1], axis=1)) + 1
                        starts = np.concatenate(([0], brk))
                        sizes = np.diff(np.concatenate((starts, [len(srt)])))
                        # deterministic bucket -> task assignment (FNV-
                        # style mix of the band minima; only balance
                        # depends on it, never correctness)
                        key = srt[starts].astype(np.uint64)
                        hsh = np.full(len(starts), 0xcbf29ce484222325,
                                      np.uint64)
                        for j in range(rpb):
                            hsh = (hsh ^ key[:, j]) * np.uint64(0x100000001b3)
                        sel = ((hsh % np.uint64(n_parts)).astype(np.int64)
                               == pid) & (sizes >= 2)
                        sel_starts, sel_sizes = starts[sel], sizes[sel]
                        for sz in np.unique(sel_sizes):
                            gs = sel_starts[sel_sizes == sz]
                            mat = order[gs[:, None] + np.arange(sz)[None, :]]
                            mat.sort(axis=1)  # table index asc == id asc
                            iu0, iu1 = np.triu_indices(sz, 1)
                            gpc = max(1, CHUNK // len(iu0))
                            for g0 in range(0, len(gs), gpc):
                                m = mat[g0:g0 + gpc]
                                A = m[:, iu0].ravel()
                                B = m[:, iu1].ravel()
                                if band:
                                    # min-band dedup: an earlier shared
                                    # band already emitted this pair
                                    dup = np.zeros(len(A), bool)
                                    for j in range(band):
                                        dup |= (
                                            mins[A, j * rpb:(j + 1) * rpb]
                                            == mins[B, j * rpb:(j + 1) * rpb]
                                        ).all(axis=1)
                                    A, B = A[~dup], B[~dup]
                                if not len(A):
                                    continue
                                est_np = (mins[A] == mins[B]).sum(axis=1)
                                ok = est_np >= est_floor
                                A, B = A[ok], B[ok]
                                if not len(A):
                                    continue
                                inter = (
                                    pop8[(wbits[A] & wbits[B]).view(np.uint8)]
                                    .reshape(len(A), -1)
                                    .sum(axis=1, dtype=np.int64)
                                )
                                tot = nsz[A] + nsz[B]
                                keep = inter >= raw_floor * (tot - inter)
                                if keep.any():
                                    yield (ids[A[keep]], ids[B[keep]],
                                           inter[keep], tot[keep])

                for batch in batches:
                    for pid in batch.column(0).to_numpy(
                            zero_copy_only=False):
                        for ia, ib, ii, tt in band_pairs(int(pid)):
                            yield pa.RecordBatch.from_arrays(
                                [pa.array(ia), pa.array(ib),
                                 pa.array(ii), pa.array(tt)],
                                names=["id_a", "id_b", "__i", "__t"],
                            )

            pre = docs.sparkSession.range(
                0, n_parts, 1, numPartitions=n_parts
            ).mapInArrow(gen, schema="id_a long, id_b long, __i long, __t long")
            jac = F.round(
                F.col("__i").cast("double")
                / (F.col("__t").cast("double") - F.col("__i").cast("double")),
                6,
            )
            verified = pre.select(
                "id_a", "id_b", jac.alias("jaccard")
            ).filter(F.col("jaccard") >= min_jaccard)
            if not memo:
                return verified
            # store at data-sized width (the verified set scales with
            # the corpus, not the candidate count — which this path
            # never materializes); downstream consumers (CC loop,
            # span stats) re-scan this frame many times
            store_width = max(1, min(n_docs // 1_000 + 1, par))
            return verified.repartition(store_width).localCheckpoint(eager=True)

        sigs = minhash_signatures(id_col=id_col, profile=prof)
        cand = lsh_candidate_pairs(sigs, id_col, memo=memo)
        if pay_bytes + mins_bytes < BROADCAST_BYTES_CAP:
            n_cand = cand.count()  # cheap: cand is checkpointed
            width = max(par, min(n_cand // 100_000 + 1, 8 * par))
            # array path (huge shingle universes, sides still under
            # the cap): fused single-stage codegen verify — mins +
            # set payload per side in one broadcast frame; the
            # estimate screen runs before the per-pair hash-set
            # intersect that dominates here
            a = F.broadcast(side.select(
                F.col(id_col).alias("id_a"), F.col("mins").alias("mins_a"),
                *sided("_a")))
            b = F.broadcast(side.select(
                F.col(id_col).alias("id_b"), F.col("mins").alias("mins_b"),
                *sided("_b")))
            joined = cand.repartition(width).join(a, "id_a").join(b, "id_b")
            verified = verify(joined.filter(est >= min_est_matches))
            if not memo:
                return verified
            store_width = max(1, min(n_cand // 500_000 + 1, par))
            return verified.repartition(store_width).localCheckpoint(eager=True)
        else:
            # two-phase: narrow screen, then the payload-attaching join
            # only for survivors
            prof_m = combined.select(F.col(id_col), mins_arr.alias("mins"))
            mins_a = prof_m.select(F.col(id_col).alias("id_a"), F.col("mins").alias("mins_a"))
            mins_b = prof_m.select(F.col(id_col).alias("id_b"), F.col("mins").alias("mins_b"))
            screened = (
                cand.join(size_hinted(mins_a, mins_bytes), "id_a")
                .join(size_hinted(mins_b, mins_bytes), "id_b")
                .filter(est >= min_est_matches)
                .select("id_a", "id_b")
                .localCheckpoint(eager=True)
            )
            n_pairs = screened.count()
            width = max(par, min(n_pairs // 20_000 + 1, 8 * par))
            sa = size_hinted(
                side.select(F.col(id_col).alias("id_a"), *sided("_a")), pay_bytes)
            sb = size_hinted(
                side.select(F.col(id_col).alias("id_b"), *sided("_b")), pay_bytes)
            pairs = screened.repartition(width).join(sa, "id_a").join(sb, "id_b")

            verified = verify(pairs)
            if not memo:
                return verified
            # store the memoized pair set at data-sized width: consumers
            # (the CC loop, the pipeline) re-scan this frame many times,
            # and inheriting the verify job's compute width (~100+
            # partitions) makes every downstream job pay that task count
            # (measured: the CC's symmetric-edge build dropped 14 → 2
            # CPU-s at sf0.1)
            store_width = max(1, min(n_pairs // 500_000 + 1, par))
            return verified.repartition(store_width).localCheckpoint(eager=True)

    if not memo:
        return build()
    key = ("near_dups", frame_key(docs), id_col, text_col,
           float(min_jaccard), int(min_est_matches))
    return DEDUP_MEMO.get_or_build(key, build)


def minhash_near_dups_sql(table: str = "documents", min_jaccard: float = 0.6,
                          id_col: str = "doc_id", text_col: str = "text",
                          min_est_matches: int = MIN_EST_MATCHES,
                          bands: int = 4, rows_per_band: int = 4) -> str:
    mins = ",\n        ".join(
        f"MIN({minhash_perm_sql(h32_sql('s'), i)}) AS m{i}" for i in range(NUM_HASHES)
    )
    band_rows = "\n      UNION ALL ".join(
        f"SELECT {id_col}, md5(concat_ws(','"
        + "".join(f", CAST(m{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band))
        + f")) AS bucket, {b} AS band_idx FROM mins"
        for b in range(bands)
    )
    est = " + ".join(
        f"(CASE WHEN ma.m{i} = mb.m{i} THEN 1 ELSE 0 END)" for i in range(NUM_HASHES)
    )
    # int-packed twin of hashed_shingle_sets (same -2^31 shift)
    shingle_hashed = (
        f"list_distinct(list_transform({char_shingles_sql(text_col)},"
        f" s -> CAST({h32_sql('s')} - 2147483648 AS INTEGER)))"
    )
    return f"""
    WITH sh AS (
      SELECT {id_col}, unnest({char_shingles_sql(text_col)}) AS s
      FROM {table}
    ),
    mins AS (
      SELECT {id_col},
        {mins}
      FROM sh GROUP BY {id_col}
    ),
    buckets AS (
      {band_rows}
    ),
    cand AS (
      SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
      FROM buckets a JOIN buckets b
        ON a.bucket = b.bucket AND a.band_idx = b.band_idx
       AND a.{id_col} < b.{id_col}
    ),
    screened AS (
      SELECT id_a, id_b
      FROM cand
      JOIN mins ma ON ma.{id_col} = cand.id_a
      JOIN mins mb ON mb.{id_col} = cand.id_b
      WHERE {est} >= {min_est_matches}
    ),
    sets AS (
      SELECT {id_col}, {shingle_hashed} AS sh FROM {table}
    )
    SELECT id_a, id_b,
           round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                 / (CAST(len(sa.sh) + len(sb.sh) AS DOUBLE)
                    - len(list_intersect(sa.sh, sb.sh))), 6) AS jaccard
    FROM screened
    JOIN sets sa ON sa.{id_col} = screened.id_a
    JOIN sets sb ON sb.{id_col} = screened.id_b
    WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                / (CAST(len(sa.sh) + len(sb.sh) AS DOUBLE)
                   - len(list_intersect(sa.sh, sb.sh))), 6) >= {min_jaccard}
    """


# ---------------------------------------------------------------------------
# Incremental (crawl-vs-index) near-dedup
# ---------------------------------------------------------------------------


def incremental_band_dedup(
    docs: DataFrame,
    min_jaccard: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    gens: int = 3,
    min_est_matches: int = MIN_EST_MATCHES,
    memo: bool = True,
) -> DataFrame:
    """Batch-incremental MinHash dedup: each crawl generation's docs
    are probed against the EXISTING index's band table only — never
    old-vs-old recompute — and only novel docs join the index for the
    next generation. This is the maintenance regime a production
    pipeline hits every crawl cycle (the full ``minhash_near_dups``
    all-pairs pass is the bootstrap, this is the steady state).

    Generations are a deterministic split (``id % gens``): gen 0 seeds
    the index; gen g in 1..gens-1 arrives as batch g. A batch doc is a
    DUP if it shares a band bucket with an index doc AND the pair
    passes the family's standard two-stage verify (signature-estimate
    screen >= ``min_est_matches``, then exact Jaccard >=
    ``min_jaccard`` — the ``minhash_near_dups`` thresholds). Output:
    one row per batch doc — (id, gen, is_novel 0/1, n_dup_partners =
    verified index partners at processing time).

    Plan shape / 100 TB story:

    - signatures come from the memoized family build
      (:func:`_shared_build`) — in production they are READ from the
      persisted index table; nothing here recomputes old docs' text.
    - the probe is a hash equi-join on (band_idx, bucket) between the
      batch's bands and the index's bands — batch-sized x index-
      bucket-matched, never all-pairs, never index x index.
    - "append only novel docs" is expressed as an anti-join of the
      previous batches' verified-dup ids (bounded by dup count per
      batch); a real deployment appends novel rows to the band table
      instead and needs no anti-join at all.
    - the per-batch verify attaches payloads for CANDIDATES only
      (batch-bounded), with the estimate screen cutting the
      set-attaching join's input first.
    """
    combined = _shared_build(docs, id_col, text_col, memo=memo)
    words = _build_words(combined)
    all_ids = docs.select(
        F.col(id_col), (F.col(id_col) % gens).cast("long").alias("gen"))

    if words:
        n_docs = combined.count()
        mins_bytes = n_docs * (NUM_HASHES * 8 + 24)
        pay_bytes = n_docs * (len(words) + 1) * 8 + n_docs * 24
    else:
        n_docs = mins_bytes = pay_bytes = None

    if words and pay_bytes + mins_bytes < BROADCAST_BYTES_CAP:
        # FUSED ALL-GENERATIONS VERIFY (r13, bitmap regime - the
        # minhash_near_dups fused template applied to the incremental
        # chain): the per-generation JVM chain below serializes two
        # (band join -> distinct -> screen+verify joins -> agg ->
        # checkpoint) rounds, ~2.5-3.5 s each at sf0.1 for 523 k+
        # candidates/gen, almost all of it exchange + AQE latency.
        # Every cross-generation candidate is instead derived and
        # verified in ONE mapInArrow pass over the broadcast minima
        # (pair oriented so id_a is the HIGHER generation - the batch
        # doc probing the index; same-generation pairs are never
        # emitted, preserving the batch-vs-index contract), and the
        # "removed docs never join the index" rule moves to an
        # anti-join on the VERIFIED pair table: per-pair verification
        # is deterministic, so filtering removed partners after the
        # verify yields exactly the pair set the per-generation probe
        # would have produced (the excluded pairs' numpy popcounts are
        # wasted work bounded by the dup rate - microseconds against
        # two saved exchange rounds). Exactness is the fused
        # near-dups argument verbatim: the UDF emits exact integers
        # screened by the exact estimate floor and a conservative
        # raw-ratio screen; the authoritative round-then-threshold
        # runs JVM-side. Past the broadcast cap the per-generation
        # probe below is unchanged - the 100 TB crawl-vs-persisted-
        # index regime.
        import numpy as np

        mcols = [f"m{i}" for i in range(NUM_HASHES)]
        pside = (
            combined.select(F.col(id_col), F.col("n_sh"), *words, *mcols)
            .toPandas()
            .sort_values(id_col)
        )
        ids_np = np.ascontiguousarray(pside[id_col].to_numpy(np.int64))
        n_np = np.ascontiguousarray(pside["n_sh"].to_numpy(np.int64))
        words_np = np.ascontiguousarray(
            pside[list(words)].to_numpy(np.int64)
        ).view(np.uint64)
        mins_np = np.ascontiguousarray(pside[mcols].to_numpy(np.int64))
        bc = docs.sparkSession.sparkContext.broadcast(
            (ids_np, n_np, words_np, mins_np)
        )
        raw_floor = float(min_jaccard) - 1e-6
        est_floor = int(min_est_matches)
        par = docs.sparkSession.sparkContext.defaultParallelism
        n_parts = max(1, min(par, n_docs // 600 + 1))
        bands, rpb = 4, NUM_HASHES // 4
        n_gens = int(gens)

        def gen_fn(batches):
            import numpy as np
            import pyarrow as pa

            ids, nsz, wbits, mins = bc.value
            gen_of = (ids % n_gens).astype(np.int64)
            pop8 = np.unpackbits(
                np.arange(256, dtype=np.uint8)[:, None], axis=1
            ).sum(axis=1).astype(np.int64)
            CHUNK = 1 << 19

            def band_pairs(pid):
                if len(mins) < 2:
                    return
                for band in range(bands):
                    sub = mins[:, band * rpb:(band + 1) * rpb]
                    order = np.lexsort(sub.T[::-1])
                    srt = sub[order]
                    brk = np.flatnonzero(
                        np.any(srt[1:] != srt[:-1], axis=1)) + 1
                    starts = np.concatenate(([0], brk))
                    sizes = np.diff(np.concatenate((starts, [len(srt)])))
                    key = srt[starts].astype(np.uint64)
                    hsh = np.full(len(starts), 0xcbf29ce484222325,
                                  np.uint64)
                    for j in range(rpb):
                        hsh = (hsh ^ key[:, j]) * np.uint64(0x100000001b3)
                    sel = ((hsh % np.uint64(n_parts)).astype(np.int64)
                           == pid) & (sizes >= 2)
                    sel_starts, sel_sizes = starts[sel], sizes[sel]
                    for sz in np.unique(sel_sizes):
                        gs = sel_starts[sel_sizes == sz]
                        mat = order[gs[:, None] + np.arange(sz)[None, :]]
                        iu0, iu1 = np.triu_indices(sz, 1)
                        gpc = max(1, CHUNK // len(iu0))
                        for g0 in range(0, len(gs), gpc):
                            m = mat[g0:g0 + gpc]
                            A = m[:, iu0].ravel()
                            B = m[:, iu1].ravel()
                            # cross-generation pairs only; orient so
                            # id_a carries the HIGHER generation (the
                            # probing batch doc)
                            cross = gen_of[A] != gen_of[B]
                            A, B = A[cross], B[cross]
                            if not len(A):
                                continue
                            swap = gen_of[A] < gen_of[B]
                            A, B = (np.where(swap, B, A),
                                    np.where(swap, A, B))
                            if band:
                                # min-band dedup: an earlier shared
                                # band already emitted this pair
                                dup = np.zeros(len(A), bool)
                                for j in range(band):
                                    dup |= (
                                        mins[A, j * rpb:(j + 1) * rpb]
                                        == mins[B, j * rpb:(j + 1) * rpb]
                                    ).all(axis=1)
                                A, B = A[~dup], B[~dup]
                            if not len(A):
                                continue
                            est_np = (mins[A] == mins[B]).sum(axis=1)
                            ok = est_np >= est_floor
                            A, B = A[ok], B[ok]
                            if not len(A):
                                continue
                            inter = (
                                pop8[(wbits[A] & wbits[B]).view(np.uint8)]
                                .reshape(len(A), -1)
                                .sum(axis=1, dtype=np.int64)
                            )
                            tot = nsz[A] + nsz[B]
                            keep = inter >= raw_floor * (tot - inter)
                            if keep.any():
                                yield (ids[A[keep]], ids[B[keep]],
                                       inter[keep], tot[keep])

            for batch in batches:
                for pid in batch.column(0).to_numpy(zero_copy_only=False):
                    for ia, ib, ii, tt in band_pairs(int(pid)):
                        yield pa.RecordBatch.from_arrays(
                            [pa.array(ia), pa.array(ib),
                             pa.array(ii), pa.array(tt)],
                            names=["id_a", "id_b", "__i", "__t"],
                        )

        pre = docs.sparkSession.range(
            0, n_parts, 1, numPartitions=n_parts
        ).mapInArrow(gen_fn, schema="id_a long, id_b long, __i long, __t long")
        jac = F.round(
            F.col("__i").cast("double")
            / (F.col("__t").cast("double") - F.col("__i").cast("double")),
            6,
        )
        # the verified cross-gen pair table is bounded by the dup rate;
        # checkpointed once, every generation's election reads it
        verified = (
            pre.select("id_a", "id_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= min_jaccard)
            .select("id_a", "id_b")
            .localCheckpoint(eager=True)
        )
        outs_f: list[DataFrame] = []
        removed_f: DataFrame | None = None
        for g in range(1, gens):
            vg = verified.filter(F.col("id_a") % gens == g)
            if removed_f is not None:
                vg = vg.join(
                    removed_f.select(F.col(id_col).alias("id_b")),
                    ["id_b"], "left_anti")
            dups = vg.groupBy("id_a").agg(
                F.count(F.lit(1)).cast("long").alias("n_dup_partners"))
            outs_f.append(
                all_ids.filter(F.col("gen") == g)
                .join(dups.withColumnRenamed("id_a", id_col),
                      [id_col], "left")
                .select(
                    id_col,
                    F.col("gen"),
                    F.when(F.col("n_dup_partners").isNull(), F.lit(1))
                    .otherwise(F.lit(0)).cast("long").alias("is_novel"),
                    F.coalesce(F.col("n_dup_partners"), F.lit(0))
                    .cast("long").alias("n_dup_partners"),
                )
            )
            newly = dups.select(F.col("id_a").alias(id_col))
            removed_f = (newly if removed_f is None
                         else removed_f.unionByName(newly))
        out_f = outs_f[0]
        for o in outs_f[1:]:
            out_f = out_f.unionByName(o)
        return out_f

    prof = combined.select(id_col, *[f"m{i}" for i in range(NUM_HASHES)])
    sigs = minhash_signatures(id_col=id_col, profile=prof)
    # narrow (id, band_idx, bucket, gen) rows, checkpointed once: every
    # generation's probe reads this frame twice (new side + old side)
    buckets = (
        sigs.select(
            F.col(id_col),
            F.posexplode(
                F.array(*[F.col(f"band{b}") for b in range(4)])
            ).alias("band_idx", "bucket"),
        )
        .withColumn("gen", F.col(id_col) % gens)
        .localCheckpoint(eager=True)
    )

    mins_arr = minhash_mins_array()

    def sided(suffix: str) -> list:
        return [
            F.col("n_sh").alias(f"n{suffix}"),
            *([F.col(w).alias(f"{w}{suffix}") for w in words] if words
              else [F.col("sh").alias(f"sh{suffix}")]),
        ]

    side = combined.select(
        F.col(id_col), mins_arr.alias("mins"), F.col("n_sh"),
        *(words if words else ["sh"]),
    )
    # size-gated broadcast of the per-doc payload sides (r13, the
    # minhash_est_audit pattern): the checkpointed build carries no
    # Catalyst stats, so without the hint AQE assumes the sides are
    # huge and plans a sort-merge join per verify — two per generation.
    # In the bitmap regime a side is n_docs·(mins + words + n_sh)
    # bytes; past the cap this degrades back to the shuffle join.
    if words:
        side_bytes = n_docs * (16 * 8 + (len(words) + 1) * 8 + 24)
    else:
        side_bytes = None  # array regime: unbounded payload, no hint
    def hinted(df: DataFrame) -> DataFrame:
        return size_hinted(df, side_bytes) if side_bytes else df
    a_side = hinted(side.select(
        F.col(id_col).alias("id_a"), F.col("mins").alias("mins_a"), *sided("_a")))
    b_side = hinted(side.select(
        F.col(id_col).alias("id_b"), F.col("mins").alias("mins_b"), *sided("_b")))
    est = minhash_est("mins_a", "mins_b")

    def verify(cand: DataFrame) -> DataFrame:
        pairs = (
            cand.join(a_side, "id_a").join(b_side, "id_b")
            .filter(est >= min_est_matches)
        )
        if words:
            return jaccard_words_projection(
                pairs, "id_a", "id_b", "_a", "_b", words, min_jaccard)
        return jaccard_projection(
            pairs, "id_a", "id_b", "sh_a", "sh_b", min_jaccard)

    outs: list[DataFrame] = []
    removed: DataFrame | None = None  # dup ids never appended to the index
    for g in range(1, gens):
        new_b = buckets.filter(F.col("gen") == g).select(
            F.col(id_col).alias("id_a"), "band_idx", "bucket")
        old_b = buckets.filter(F.col("gen") < g)
        if removed is not None:
            old_b = old_b.join(removed, [id_col], "left_anti")
        cand = (
            new_b.join(
                old_b.select(
                    F.col(id_col).alias("id_b"), "band_idx", "bucket"),
                ["band_idx", "bucket"],
            )
            .select("id_a", "id_b")
            .distinct()
        )
        # (id_a, n_dup_partners): consumed twice (output row + the next
        # generation's index anti-join) — checkpoint the bounded frame
        dups = (
            verify(cand)
            .groupBy("id_a")
            .agg(F.count(F.lit(1)).cast("long").alias("n_dup_partners"))
            .localCheckpoint(eager=True)
        )
        outs.append(
            all_ids.filter(F.col("gen") == g)
            .join(dups.withColumnRenamed("id_a", id_col), [id_col], "left")
            .select(
                id_col,
                F.col("gen"),
                F.when(F.col("n_dup_partners").isNull(), F.lit(1))
                .otherwise(F.lit(0)).cast("long").alias("is_novel"),
                F.coalesce(F.col("n_dup_partners"), F.lit(0))
                .cast("long").alias("n_dup_partners"),
            )
        )
        newly = dups.select(F.col("id_a").alias(id_col))
        removed = newly if removed is None else removed.unionByName(newly)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def incremental_dedup_sql(
    table: str = "documents", min_jaccard: float = 0.6,
    id_col: str = "doc_id", text_col: str = "text", gens: int = 3,
    min_est_matches: int = MIN_EST_MATCHES,
    bands: int = 4, rows_per_band: int = 4,
) -> str:
    """DuckDB replay of :func:`incremental_band_dedup`: the same mins/
    bands/sets fragments as ``minhash_near_dups_sql``, then one
    (candidate -> screen+verify -> dup) CTE block per generation, each
    generation's old side excluding earlier generations' verified
    dups — two chained snapshot generations by default."""
    mins = ",\n        ".join(
        f"MIN({minhash_perm_sql(h32_sql('s'), i)}) AS m{i}"
        for i in range(NUM_HASHES)
    )
    band_rows = "\n      UNION ALL ".join(
        f"SELECT {id_col}, md5(concat_ws(','"
        + "".join(
            f", CAST(m{b * rows_per_band + r} AS VARCHAR)"
            for r in range(rows_per_band))
        + f")) AS bucket, {b} AS band_idx FROM mins"
        for b in range(bands)
    )
    est = " + ".join(
        f"(CASE WHEN ma.m{i} = mb.m{i} THEN 1 ELSE 0 END)"
        for i in range(NUM_HASHES)
    )
    shingle_hashed = (
        f"list_distinct(list_transform({char_shingles_sql(text_col)},"
        f" s -> CAST({h32_sql('s')} - 2147483648 AS INTEGER)))"
    )
    jac = (
        "round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)"
        " / (CAST(len(sa.sh) + len(sb.sh) AS DOUBLE)"
        " - len(list_intersect(sa.sh, sb.sh))), 6)"
    )
    parts = [
        f"""sh AS (
      SELECT {id_col}, unnest({char_shingles_sql(text_col)}) AS s
      FROM {table}
    )""",
        f"""mins AS (
      SELECT {id_col},
        {mins}
      FROM sh GROUP BY {id_col}
    )""",
        f"""buckets AS MATERIALIZED (
      {band_rows}
    )""",
        f"""sets AS (
      SELECT {id_col}, {shingle_hashed} AS sh FROM {table}
    )""",
    ]
    outs = []
    for g in range(1, gens):
        old_conds = []
        for og in range(g):
            cond = f"o.{id_col} % {gens} = {og}"
            if og >= 1:
                cond = (f"({cond} AND o.{id_col} NOT IN"
                        f" (SELECT new_id FROM dup{og}))")
            old_conds.append(cond)
        parts.append(
            f"""cand{g} AS (
      SELECT DISTINCT n.{id_col} AS new_id, o.{id_col} AS old_id
      FROM buckets n JOIN buckets o
        ON n.bucket = o.bucket AND n.band_idx = o.band_idx
      WHERE n.{id_col} % {gens} = {g}
        AND ({' OR '.join(old_conds)}))"""
        )
        parts.append(
            f"""ver{g} AS (
      SELECT new_id, old_id
      FROM cand{g}
      JOIN mins ma ON ma.{id_col} = cand{g}.new_id
      JOIN mins mb ON mb.{id_col} = cand{g}.old_id
      JOIN sets sa ON sa.{id_col} = cand{g}.new_id
      JOIN sets sb ON sb.{id_col} = cand{g}.old_id
      WHERE {est} >= {min_est_matches} AND {jac} >= {min_jaccard})"""
        )
        parts.append(
            f"dup{g} AS MATERIALIZED (SELECT new_id,"
            f" COUNT(*)::BIGINT AS n_dup FROM ver{g} GROUP BY 1)"
        )
        outs.append(
            f"""SELECT d.{id_col}, CAST({g} AS BIGINT) AS gen,
           CAST(CASE WHEN dup{g}.new_id IS NULL THEN 1 ELSE 0 END
                AS BIGINT) AS is_novel,
           CAST(COALESCE(dup{g}.n_dup, 0) AS BIGINT) AS n_dup_partners
    FROM {table} d LEFT JOIN dup{g} ON dup{g}.new_id = d.{id_col}
    WHERE d.{id_col} % {gens} = {g}"""
        )
    return (
        "WITH " + ",\n    ".join(parts) + "\n    "
        + "\n    UNION ALL\n    ".join(outs)
    )


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


def banded_ngram_jaccard(
    docs: DataFrame, block_exprs: dict[str, Column], id_col: str = "doc_id",
    text_col: str = "text", memo: bool = True,
) -> DataFrame:
    """Exact k-gram Jaccard for pairs blocked on cheap metadata keys
    AND a shared MinHash band — the scale-sound successor to plain
    metadata blocking (:func:`ngram_jaccard_pairs`).

    Metadata-only blocks (lang × length-bucket) have a FIXED key
    cardinality, so block population — and the within-block pair join —
    grows quadratically with the corpus. Adding a band digest to the
    block key makes block sizes corpus-invariant: band values multiply
    with content diversity, and only docs that already agree on 4 of
    16 signature minima collide, which is exactly the dup-cluster mass
    the operator exists to score. Cost becomes LSH-candidate-shaped
    (linear-ish in true near-dup volume), never all-pairs-in-block.

    The verify reuses the session-memoized :func:`_shared_build`: zero
    extra text passes, and in the bitmap regime the per-pair exact
    Jaccard is W ANDs + popcounts. No threshold — every blocked pair's
    exact Jaccard is reported (this is a similarity REPORT, not a dedup
    decision; filter downstream).

    ``block_exprs`` maps block-key names to Column expressions over
    ``docs`` — expressions rather than pre-added columns so the shared
    build keys on the RAW frame and memo-shares with the rest of the
    dedup family."""
    block_cols = list(block_exprs)
    combined = _shared_build(docs, id_col, text_col, memo=memo)
    words = _build_words(combined)
    prof = combined.select(id_col, *[f"m{i}" for i in range(NUM_HASHES)])
    sigs = minhash_signatures(id_col=id_col, profile=prof)
    meta = docs.select(
        F.col(id_col), *[e.alias(n) for n, e in block_exprs.items()])
    buckets = (
        sigs.select(
            F.col(id_col),
            F.posexplode(F.array(*[F.col(f"band{b}") for b in range(4)])).alias(
                "band_idx", "bucket"),
        )
        .join(meta, id_col)
        .localCheckpoint(eager=True)
    )
    n_buckets = buckets.count()
    bucket_bytes = n_buckets * (48 + 16 * len(block_cols))
    keys = [*block_cols, "band_idx", "bucket"]
    left = buckets.select(F.col(id_col).alias("id_a"), *keys)
    right = size_hinted(
        buckets.select(F.col(id_col).alias("id_b"), *keys), bucket_bytes)
    cand = (
        left.join(right, keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    n_docs = combined.count()
    if words:
        pay = combined.select(F.col(id_col), "n_sh", *words)
        pay_bytes = n_docs * ((len(words) + 1) * 8 + 24)
        a = size_hinted(pay.select(
            F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"),
            *[F.col(w).alias(f"{w}_a") for w in words]), pay_bytes)
        b = size_hinted(pay.select(
            F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"),
            *[F.col(w).alias(f"{w}_b") for w in words]), pay_bytes)
        return jaccard_words_projection(
            cand.join(a, "id_a").join(b, "id_b"),
            "id_a", "id_b", "_a", "_b", words, 0.0)
    sets = shared_sets(docs, id_col, text_col, memo=memo)
    nh = sets.select(F.sum(F.size("sh"))).collect()[0][0] or 0
    sets_bytes = nh * 4 + n_docs * 32
    sa = size_hinted(sets.select(
        F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), sets_bytes)
    sb = size_hinted(sets.select(
        F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), sets_bytes)
    return jaccard_projection(
        cand.join(sa, "id_a").join(sb, "id_b"),
        "id_a", "id_b", "sh_a", "sh_b", 0.0)


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def contamination_scores(
    docs: DataFrame,
    bench_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_shared: int = 1,
) -> DataFrame:
    """Per-doc overlap with a benchmark/eval corpus: the number of
    distinct k-shingle hashes a training doc shares with the UNION of
    all benchmark shingles — the standard pretraining-hygiene pass
    (drop or flag docs that leak eval content). Returns
    ``(id, n_shared)`` for docs with ``n_shared >= min_shared``.

    Scale shape: the benchmark side is bounded (eval suites are MBs
    against a 100 TB corpus), so its distinct hash set is materialized
    once (eager checkpoint + measured size) and broadcast; the training
    side streams map-side through normalize→shingle→hash, the semi
    overlap is a broadcast hash join probe, and the only shuffle is the
    final count aggregate keyed by doc id (uniform — no skew). Common
    shingles concentrate on the BENCHMARK side, which is the small
    broadcast side, so hot n-grams never serialize a task."""
    # session-memoized: the batch row and its streaming twin
    # (decontaminate_stream) build the identical bounded hash set —
    # one checkpoint serves both in a suite run, and a restarted
    # streaming query reuses it across restarts within the session
    bench_hashes = DEDUP_MEMO.get_or_build(
        ("bench_hashes", frame_key(bench_docs), id_col, text_col, k),
        lambda: (
            shingle_hashes(bench_docs, id_col, text_col, k=k)
            .select("h").distinct().localCheckpoint(eager=True)
        ),
    )
    bh_bytes = bench_hashes.count() * 16
    train_hashes = shingle_hashes(docs, id_col, text_col, k=k)
    return (
        train_hashes.join(size_hinted(bench_hashes, bh_bytes), "h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def contamination_scores_sql(
    table: str = "documents",
    bench_pred: str = "doc_id % 20 = 0",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared: int = 1,
) -> str:
    """DuckDB twin of :func:`contamination_scores` with the benchmark
    set carved out of the same table by ``bench_pred``."""
    sh = char_shingles_sql(text_col)
    return f"""
    WITH bench AS (
      SELECT DISTINCT {h32_sql('s')} AS h
      FROM (SELECT unnest({sh}) AS s FROM {table} WHERE {bench_pred})
    ),
    train AS (
      SELECT {id_col}, {h32_sql('s')} AS h
      FROM (SELECT {id_col}, unnest({sh}) AS s
            FROM {table} WHERE NOT ({bench_pred}))
    )
    SELECT {id_col}, COUNT(*) AS n_shared
    FROM train JOIN bench USING (h)
    GROUP BY {id_col}
    HAVING COUNT(*) >= {min_shared}
    """


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer/Wilkerson/Aiken — the MOSS rule)
# ---------------------------------------------------------------------------


def winnow_selected(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """(id, pos, wm): for each full window of ``w`` consecutive k-gram
    hashes, the window minimum — the winnowing selection. The DISTINCT
    ``wm`` values per doc form its fingerprint set, guaranteed to share
    a value with any doc containing the same substring of length >=
    ``k + w - 1`` (the two windows over the shared region pick the same
    minimum hash).

    Every position's hash feeds the window; only window STARTS beyond
    the last full window are dropped (after the min is computed), so
    end-of-doc windows still see their full ``w`` hashes — canonical
    semantics.

    The md5-h32 value is the CONTRACT (fingerprints are output), but
    WHERE it's computed is not: like ``_shared_build``, the hash is
    evaluated once per DISTINCT k-gram on a charset^k-bounded broadcast
    dictionary instead of once per position — identical values, and
    the per-position md5→hex→conv pipeline (measured ~11 CPU-s per
    1.5 M positions at sf0.1) drops off the hot path. Falls back to
    per-position hashing past ``DIM_MAX_ROWS``.

    Plan shape: the input barrier hash-partitions on the DOC ID, and
    explode / project / broadcast-join all preserve that partitioning,
    so every window below is satisfied by the one upfront exchange —
    the position frame (the big one) is shuffled exactly once. The
    window min itself never uses a sliding ``rowsBetween(0, w-1)``
    frame (WindowExec re-scans the w-row buffer per output row — the
    r7 CPU hot spot): small ``w`` takes a lead-chain
    ``least(h, lead(h,1..w-1))`` — one window pass, O(1) offset frames
    — and larger ``w`` the classic segmented min (bucket ``pos div w``;
    running min ascending + running min descending per bucket; window
    min = least(suffix[i], prefix[i+w-1])) — two O(1)/row cumulative
    passes + one lead, still zero extra exchanges since hash(id)
    satisfies the (id, bucket) clustering."""
    from pyspark.sql import Window as W

    norm = docs.select(F.col(id_col), normalized(F.col(text_col)).alias("__t"))
    norm = norm.repartition(barrier_width(norm), F.col(id_col))
    idx = F.sequence(F.lit(1), F.greatest(F.length("__t") - (k - 1), F.lit(0)))
    toks = norm.select(
        F.col(id_col),
        (F.length("__t") - (k - 1)).alias("n_grams"),
        F.col("__t"),
        F.explode(idx).alias("pos"),
    ).select(
        id_col, "n_grams", "pos",
        F.col("__t").substr(F.col("pos"), F.lit(k)).alias("__s"),
    )
    dim = (
        toks.select("__s").distinct()
        .select("__s", h32(F.col("__s")).alias("h"))
        .localCheckpoint(eager=True)  # tiny; count + broadcast reuse it
    )
    if dim.count() <= DIM_MAX_ROWS:
        pos_hashes = toks.join(F.broadcast(dim), "__s").select(
            id_col, "n_grams", "pos", "h")
    else:
        pos_hashes = toks.select(
            id_col, "n_grams", "pos", h32(F.col("__s")).alias("h"))
    win_doc = W.partitionBy(id_col).orderBy("pos")
    if w <= 8:
        # lead-chain: for kept rows (full windows only) every lead is
        # non-null, so least() == the w-element window min
        wm = F.least(
            F.col("h"), *[F.lead("h", i).over(win_doc) for i in range(1, w)]
        )
        sel = pos_hashes.select(id_col, "pos", "n_grams", wm.alias("wm"))
    else:
        win_b_asc = (
            W.partitionBy(id_col, "__b").orderBy("pos")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        win_b_desc = (
            W.partitionBy(id_col, "__b").orderBy(F.desc("pos"))
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        # window [i, i+w-1] spans at most the tail of bucket(i) plus
        # the head of bucket(i)+1: suffix[i] covers [i, bucket_end],
        # prefix[i+w-1] covers [next_bucket_start, i+w-1] (or the whole
        # single bucket when i is bucket-aligned — then both equal its
        # full min), so least() of the two is exactly the window min
        sel = (
            pos_hashes.withColumn("__b", F.expr(f"(pos - 1) div {w}"))
            .select(
                id_col, "pos", "n_grams",
                F.min("h").over(win_b_asc).alias("__pmin"),
                F.min("h").over(win_b_desc).alias("__smin"),
            )
            .select(
                id_col, "pos", "n_grams",
                F.least(
                    "__smin", F.lead("__pmin", w - 1).over(win_doc)
                ).alias("wm"),
            )
        )
    return (
        sel.filter(F.col("pos") <= F.col("n_grams") - (w - 1))
        .select(id_col, "pos", "wm")
    )


def winnow_fingerprint_summary(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """(id, n_fps, min_fp, max_fp): per-doc summary of the winnowing
    selection — DISTINCT count / min / max of :func:`winnow_selected`'s
    ``wm`` values (pinned equal by ``test_winnow_summary_matches_
    selected``).

    Fused Arrow path: winnowing is PER-DOC-LOCAL (one row in, one row
    out, nothing crosses documents), so the scale-correct plan is a
    zero-shuffle ``mapInPandas`` over doc rows — normalize JVM-side,
    then per doc in vectorized Python: k-gram → md5-h32 through a
    per-task gram cache (one hashlib call per DISTINCT gram, the same
    dictionary trick as the declarative path), sliding-window min via
    ``np.minimum`` over ``w`` shifted views, ``np.unique`` for the
    fingerprint set. The declarative :func:`winnow_selected` pipeline
    needs the explode twice (dictionary gate + probe) plus a window
    sort and an aggregate — measured ~17 CPU-s at sf0.1 vs ~3 here,
    identical output. Use ``winnow_selected`` when per-position
    ``(id, pos, wm)`` rows are the product; use this when the per-doc
    fingerprint summary is.

    100 TB design: embarrassingly parallel — docs partition-local, no
    exchange anywhere (the width barrier is a narrow 2-column
    shuffle), Arrow-batched transfer, per-task memory O(doc length +
    charset^k cache). The stage width is DATA-sized
    (:func:`pandas_stage_width`), not core-sized: Python tasks carry
    ~0.3 CPU-s fixed overhead each, so a small corpus runs in few
    tasks while a 100 TB one still fans out to millions."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_fps", T.LongType()),
            T.StructField("min_fp", T.LongType()),
            T.StructField("max_fp", T.LongType()),
        ]
    )
    norm = docs.select(F.col(id_col), normalized(F.col(text_col)).alias("__t"))
    norm = norm.repartition(pandas_stage_width(norm))

    def gen(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        cache: dict = {}

        def h(g):
            v = cache.get(g)
            if v is None:
                # h32 contract: first 8 hex chars of md5 as an int
                # (== conv(substr(md5(s),1,8),16,10) on the JVM side)
                v = int.from_bytes(
                    hashlib.md5(g.encode("utf-8")).digest()[:4], "big")
                cache[g] = v
            return v

        for pdf in batches:
            ids, nf, mn, mx = [], [], [], []
            for doc_id, t in zip(pdf[id_col], pdf["__t"]):
                if t is None:
                    continue
                n = len(t) - (k - 1)  # codepoint length == JVM length()
                if n < w:  # no full w-window of k-gram hashes
                    continue
                hs = np.fromiter(
                    (h(t[i:i + k]) for i in range(n)),
                    dtype=np.int64, count=n,
                )
                mins = hs[: n - w + 1].copy()
                for off in range(1, w):
                    np.minimum(mins, hs[off: n - w + 1 + off], out=mins)
                u = np.unique(mins)
                ids.append(doc_id)
                nf.append(len(u))
                mn.append(int(u[0]))
                mx.append(int(u[-1]))
            yield pd.DataFrame(
                {id_col: ids, "n_fps": nf, "min_fp": mn, "max_fp": mx})

    return norm.mapInPandas(gen, schema=out_schema)


# ---------------------------------------------------------------------------
# cross-corpus near-dedup (new crawl vs existing corpus)
# ---------------------------------------------------------------------------


def _cross_verify(
    side_new: DataFrame,
    side_base: DataFrame,
    min_jaccard: float,
    id_col: str,
    min_est_matches: int,
    words: list[str] | None = None,
) -> DataFrame:
    """Shared tail of the cross-corpus pipeline: band buckets per side,
    cross-side candidate join, estimate screen, exact-Jaccard verify.

    Each side is ONE frame carrying the MinHash minima (``m0..m15``)
    plus the verify payload — ``n_sh`` + bitmap word columns when both
    sides are slices of one :func:`_shared_build` (the in-table
    incremental case: shared bit universe, verify = popcounts of ANDs;
    pass ``words``), or a hash array ``sh`` for two independent builds
    (incompatible bit assignments). Single-frame sides mean the
    in-table path never self-joins its own build's slices."""
    prof_n, prof_b = side_new, side_base

    if words:
        # FUSED CROSS-BANDED VERIFY (r8, in-table bitmap regime): the
        # same move as minhash_near_dups' fused path — the cross band
        # join, estimate screen, and popcount verify are all pure
        # functions of the two bounded side tables, and shipping the
        # candidate pairs through the JVM join pipeline (bucket join +
        # distinct + two payload-attaching joins, ~60 columns per pair)
        # was the cost. Each task re-derives the cross-band buckets it
        # OWNS from the broadcast minima (lexsort both sides' band
        # tuples together, split groups, new-side x base-side cross
        # product per group via grouped-cartesian index arithmetic),
        # drops pairs sharing an EARLIER band (exact min-band dedup —
        # no distinct anywhere), then screens + popcount-verifies in
        # the same array pass. Exactness contract identical to the
        # fused in-corpus path: only exact integers leave the UDF and
        # the authoritative round-then-threshold runs JVM-side.
        # Size-gated like the JVM path below; past the cap (the 100 TB
        # base corpus) the distributed join pipeline below runs
        # unchanged.
        n_new = side_new.count()
        n_base = side_base.count()
        per_doc = (len(words) + 1) * 8 + NUM_HASHES * 8 + 56
        if (n_new + n_base) * per_doc < BROADCAST_BYTES_CAP:
            import numpy as np

            mcols = [f"m{i}" for i in range(NUM_HASHES)]

            def np_side(side: DataFrame):
                p = (
                    side.select(
                        F.col(id_col), F.col("n_sh"), *words, *mcols)
                    .toPandas()
                    .sort_values(id_col)
                )
                return (
                    np.ascontiguousarray(p[id_col].to_numpy(np.int64)),
                    np.ascontiguousarray(p["n_sh"].to_numpy(np.int64)),
                    np.ascontiguousarray(
                        p[list(words)].to_numpy(np.int64)).view(np.uint64),
                    np.ascontiguousarray(p[mcols].to_numpy(np.int64)),
                )

            bc = side_new.sparkSession.sparkContext.broadcast(
                (np_side(side_new), np_side(side_base)))
            raw_floor = float(min_jaccard) - 1e-6
            est_floor = int(min_est_matches)
            par = side_new.sparkSession.sparkContext.defaultParallelism
            n_parts = max(1, min(par, (n_new + n_base) // 600 + 1))
            bands, rpb = 4, NUM_HASHES // 4

            def gen(batches):
                import numpy as np
                import pyarrow as pa

                (ids_n, nsz_n, w_n, m_n), (ids_b, nsz_b, w_b, m_b) = bc.value
                nn = len(ids_n)
                pop8 = np.unpackbits(
                    np.arange(256, dtype=np.uint8)[:, None], axis=1
                ).sum(axis=1).astype(np.int64)
                CHUNK = 1 << 19

                def cross_pairs(pid):
                    if nn == 0 or len(ids_b) == 0:
                        return
                    for band in range(bands):
                        sl = slice(band * rpb, (band + 1) * rpb)
                        allm = np.concatenate([m_n[:, sl], m_b[:, sl]])
                        order = np.lexsort(allm.T[::-1])
                        srt = allm[order]
                        brk = np.flatnonzero(
                            np.any(srt[1:] != srt[:-1], axis=1)) + 1
                        starts = np.concatenate(([0], brk))
                        ends = np.concatenate((brk, [len(srt)]))
                        # new-side members first within each group
                        gid = np.zeros(len(srt), np.int64)
                        gid[brk] = 1
                        gid = np.cumsum(gid)
                        is_new = order < nn
                        pos2 = np.lexsort(
                            (np.where(is_new, 0, 1), gid))
                        members2 = order[pos2]
                        csum = np.concatenate(
                            ([0], np.cumsum(is_new[pos2])))
                        cn = csum[ends] - csum[starts]
                        cb = (ends - starts) - cn
                        key = srt[starts].astype(np.uint64)
                        hsh = np.full(len(starts), 0xcbf29ce484222325,
                                      np.uint64)
                        for j in range(rpb):
                            hsh = ((hsh ^ key[:, j])
                                   * np.uint64(0x100000001b3))
                        sel = (((hsh % np.uint64(n_parts)).astype(np.int64)
                                == pid) & (cn > 0) & (cb > 0))
                        st2, gn, gb = starts[sel], cn[sel], cb[sel]
                        if not len(st2):
                            continue
                        off = np.concatenate(([0], np.cumsum(gn * gb)))
                        total = off[-1]
                        for c0 in range(0, int(total), CHUNK):
                            idx = np.arange(
                                c0, min(c0 + CHUNK, int(total)))
                            g = np.searchsorted(off, idx, "right") - 1
                            r = idx - off[g]
                            A = members2[st2[g] + r // gb[g]]
                            Bm = members2[
                                st2[g] + gn[g] + r % gb[g]] - nn
                            if band:
                                dup = np.zeros(len(A), bool)
                                for j in range(band):
                                    js = slice(j * rpb, (j + 1) * rpb)
                                    dup |= (m_n[A, js]
                                            == m_b[Bm, js]).all(axis=1)
                                A, Bm = A[~dup], Bm[~dup]
                            if not len(A):
                                continue
                            est_np = (m_n[A] == m_b[Bm]).sum(axis=1)
                            ok = est_np >= est_floor
                            A, Bm = A[ok], Bm[ok]
                            if not len(A):
                                continue
                            inter = (
                                pop8[(w_n[A] & w_b[Bm]).view(np.uint8)]
                                .reshape(len(A), -1)
                                .sum(axis=1, dtype=np.int64)
                            )
                            tot = nsz_n[A] + nsz_b[Bm]
                            keep = inter >= raw_floor * (tot - inter)
                            if keep.any():
                                yield (ids_n[A[keep]], ids_b[Bm[keep]],
                                       inter[keep], tot[keep])

                for batch in batches:
                    for pid in batch.column(0).to_numpy(
                            zero_copy_only=False):
                        for i_n, i_b, ii, tt in cross_pairs(int(pid)):
                            yield pa.RecordBatch.from_arrays(
                                [pa.array(i_n), pa.array(i_b),
                                 pa.array(ii), pa.array(tt)],
                                names=["id_new", "id_base", "__i", "__t"],
                            )

            pre = side_new.sparkSession.range(
                0, n_parts, 1, numPartitions=n_parts
            ).mapInArrow(
                gen, schema="id_new long, id_base long, __i long, __t long")
            jac = F.round(
                F.col("__i").cast("double")
                / (F.col("__t").cast("double")
                   - F.col("__i").cast("double")),
                6,
            )
            return pre.select(
                "id_new", "id_base", jac.alias("jaccard")
            ).filter(F.col("jaccard") >= min_jaccard)

    sig_n = minhash_signatures(id_col=id_col, profile=prof_n)
    sig_b = minhash_signatures(id_col=id_col, profile=prof_b)

    def buckets(sig: DataFrame, out_id: str) -> DataFrame:
        return sig.select(
            F.col(id_col).alias(out_id),
            F.posexplode(F.array(*[F.col(f"band{b}") for b in range(4)])).alias(
                "band_idx", "bucket"
            ),
        )

    cand = (
        buckets(sig_n, "id_new")
        .join(buckets(sig_b, "id_base"), ["bucket", "band_idx"])
        .select("id_new", "id_base")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_cand = cand.count()
    par = cand.sparkSession.sparkContext.defaultParallelism
    width = max(par, min(n_cand // 20_000 + 1, 8 * par))
    if width <= 2 * cand.rdd.getNumPartitions():
        # the checkpoint already spreads the pairs ~this wide; a second
        # full shuffle of the candidate set buys nothing
        width = None

    mins_arr = minhash_mins_array()
    est = minhash_est("mins_n", "mins_b")
    # size-gated like minhash_near_dups' verify: the base corpus at
    # 100 TB will NOT fit a broadcast — size_hinted degrades each side
    # independently to a shuffle join past the cap instead of dying on
    # Spark's broadcast limit. Bytes are measured, not assumed: rows x
    # (16 minima + avg set payload).
    def side_bytes(side: DataFrame) -> int:
        if words:
            n_docs = side.count()
            return n_docs * ((len(words) + 1) * 8 + NUM_HASHES * 8 + 56)
        stats = side.select(
            F.count(F.lit(1)).alias("n"), F.sum(F.size("sh")).alias("nh")
        ).collect()[0]
        n_docs = stats["n"] or 0
        return (stats["nh"] or 0) * 4 + n_docs * (NUM_HASHES * 8 + 56)

    def payload(suffix: str) -> list:
        if words:
            return [
                F.col("n_sh").alias(f"n{suffix}"),
                *[F.col(w).alias(f"{w}{suffix}") for w in words],
            ]
        return [F.col("sh").alias(f"sh{suffix}")]

    side_n = size_hinted(
        side_new.select(
            F.col(id_col).alias("id_new"), mins_arr.alias("mins_n"),
            *payload("_n")),
        side_bytes(side_new))
    side_b = size_hinted(
        side_base.select(
            F.col(id_col).alias("id_base"), mins_arr.alias("mins_b"),
            *payload("_b")),
        side_bytes(side_base))
    spread = cand.repartition(width) if width else cand
    attached = spread.join(side_n, "id_new").join(side_b, "id_base")
    if words:
        # popcount-first (the in-corpus verify's r6 lesson): the exact
        # bitmap Jaccard (W ANDs + popcounts) is cheaper per row than
        # the 16-term getItem estimate, so it runs first and the
        # estimate screen — still part of the contract — only sees the
        # survivors. Pure reordering of conjuncts: the result set is
        # identical.
        out = jaccard_words_projection(
            attached, "id_new", "id_base", "_n", "_b", words, min_jaccard,
            carry=["mins_n", "mins_b"])
        return out.filter(est >= min_est_matches).select(
            "id_new", "id_base", "jaccard")
    screened = attached.filter(est >= min_est_matches)
    return jaccard_projection(
        screened, "id_new", "id_base", "sh_n", "sh_b", min_jaccard)


def cross_near_dups(
    new_docs: DataFrame,
    base_docs: DataFrame,
    min_jaccard: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_est_matches: int = MIN_EST_MATCHES,
    memo: bool = True,
) -> DataFrame:
    """Incremental near-dedup: pairs (id_new, id_base) with exact
    Jaccard >= threshold between a NEW corpus and an existing BASE
    corpus — the "dedup this crawl against everything we already have"
    pass. Same LSH -> estimate screen -> exact verify contract as
    :func:`minhash_near_dups`, but the band-bucket join is ACROSS
    corpora (never within either side), so cost is driven by
    cross-collisions only.

    This two-frame form shingles each corpus independently — use it
    when the corpora are genuinely separate tables. When both sides
    are filters of ONE table, :func:`cross_near_dups_in_table` derives
    them from the single full-corpus build instead (one corpus pass,
    memo-shared with the whole dedup family).

    At 100 TB the base side's signatures/sets would persist as tables
    between crawls; the per-crawl cost is the new side's map-side
    shingle pass plus the bucket equi-join."""
    prof_n = shared_profile(new_docs, id_col, text_col, memo=memo)
    prof_b = shared_profile(base_docs, id_col, text_col, memo=memo)
    sets_n = shared_sets(new_docs, id_col, text_col, memo=memo)
    sets_b = shared_sets(base_docs, id_col, text_col, memo=memo)
    return _cross_verify(
        prof_n.join(sets_n, id_col), prof_b.join(sets_b, id_col),
        min_jaccard, id_col, min_est_matches,
    )


def cross_near_dups_in_table(
    docs: DataFrame,
    new_pred: Column,
    min_jaccard: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_est_matches: int = MIN_EST_MATCHES,
    memo: bool = True,
) -> DataFrame:
    """:func:`cross_near_dups` for the common case where the "new" and
    "base" corpora are partitions of ONE table selected by ``new_pred``
    (a boolean Column over the id column — it is applied to the
    per-doc sets/profile frames, which carry only ``id_col``).

    The full-corpus sets + MinHash profile are built ONCE (the same
    session-memoized frames every other dedup query uses) and each
    side is a filter over them — per-doc rows, so filtering commutes
    with the build. Measured at sf0.1: 8.4s -> ~2s cold when the
    dedup family has already run, and one corpus pass instead of two
    either way."""
    combined = _shared_build(docs, id_col, text_col, memo=memo)
    words = _build_words(combined)
    return _cross_verify(
        combined.filter(new_pred), combined.filter(~new_pred),
        min_jaccard, id_col, min_est_matches,
        words=words or None,
    )


def cross_near_dups_sql(
    table: str = "documents",
    new_pred: str = "doc_id % 3 = 0",
    min_jaccard: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_est_matches: int = MIN_EST_MATCHES,
    bands: int = 4,
    rows_per_band: int = 4,
) -> str:
    """DuckDB twin of :func:`cross_near_dups` with the two corpora
    carved out of one table by ``new_pred``."""
    mins = ",\n        ".join(
        f"MIN({minhash_perm_sql(h32_sql('s'), i)}) AS m{i}" for i in range(NUM_HASHES)
    )
    def band_rows(src: str) -> str:
        return "\n      UNION ALL ".join(
            f"SELECT {id_col}, md5(concat_ws(','"
            + "".join(f", CAST(m{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band))
            + f")) AS bucket, {b} AS band_idx FROM {src}"
            for b in range(bands)
        )
    est = " + ".join(
        f"(CASE WHEN mn.m{i} = mb.m{i} THEN 1 ELSE 0 END)" for i in range(NUM_HASHES)
    )
    shingle_hashed = (
        f"list_distinct(list_transform({char_shingles_sql(text_col)},"
        f" s -> CAST({h32_sql('s')} - 2147483648 AS INTEGER)))"
    )
    return f"""
    WITH newd AS (SELECT * FROM {table} WHERE {new_pred}),
    based AS (SELECT * FROM {table} WHERE NOT ({new_pred})),
    shn AS (SELECT {id_col}, unnest({char_shingles_sql(text_col)}) AS s FROM newd),
    minsn AS (SELECT {id_col},
        {mins}
      FROM shn GROUP BY {id_col}),
    shb AS (SELECT {id_col}, unnest({char_shingles_sql(text_col)}) AS s FROM based),
    minsb AS (SELECT {id_col},
        {mins}
      FROM shb GROUP BY {id_col}),
    bucketsn AS (
      {band_rows('minsn')}
    ),
    bucketsb AS (
      {band_rows('minsb')}
    ),
    cand AS (
      SELECT DISTINCT n.{id_col} AS id_new, b.{id_col} AS id_base
      FROM bucketsn n JOIN bucketsb b
        ON n.bucket = b.bucket AND n.band_idx = b.band_idx
    ),
    screened AS (
      SELECT id_new, id_base
      FROM cand
      JOIN minsn mn ON mn.{id_col} = cand.id_new
      JOIN minsb mb ON mb.{id_col} = cand.id_base
      WHERE {est} >= {min_est_matches}
    ),
    setsn AS (SELECT {id_col}, {shingle_hashed} AS sh FROM newd),
    setsb AS (SELECT {id_col}, {shingle_hashed} AS sh FROM based)
    SELECT id_new, id_base,
           round(CAST(len(list_intersect(sn.sh, sb.sh)) AS DOUBLE)
                 / (CAST(len(sn.sh) + len(sb.sh) AS DOUBLE)
                    - len(list_intersect(sn.sh, sb.sh))), 6) AS jaccard
    FROM screened
    JOIN setsn sn ON sn.{id_col} = screened.id_new
    JOIN setsb sb ON sb.{id_col} = screened.id_base
    WHERE round(CAST(len(list_intersect(sn.sh, sb.sh)) AS DOUBLE)
                / (CAST(len(sn.sh) + len(sb.sh) AS DOUBLE)
                   - len(list_intersect(sn.sh, sb.sh))), 6) >= {min_jaccard}
    """


# ---------------------------------------------------------------------------
# prefix-filtered exact set-similarity self-join (AllPairs / PPJoin family)
# ---------------------------------------------------------------------------

def prefix_filtered_pairs(
    docs: DataFrame,
    min_jaccard: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 7,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """EXACT Jaccard ≥ t self-join via prefix filtering (Bayardo et al.
    AllPairs / Xiao et al. PPJoin): order every doc's shingles by one
    global rarity order (document frequency asc, hash asc) and keep
    only each doc's first ``|s| - ceil(t·|s|) + 1`` shingles as its
    PREFIX. Any pair with J ≥ t provably shares a prefix shingle, so
    candidates come from a prefix×prefix equi-join — rare shingles
    only — instead of the full co-occurrence join. Two further PPJoin
    prunes run INSIDE the candidate join, both integer-exact:

    - length filter: 20·|b| ≥ t20·|a| (a J ≥ t pair can't differ in
      size by more than 1/t);
    - positional filter: from matching prefix positions (rk_a, rk_b),
      the overlap can't exceed 1 + min(|a|−rk_a, |b|−rk_b); require
      that bound to reach α = ceil(t/(1+t)·(|a|+|b|)), i.e.
      (1 + min(...))·(20 + t20) ≥ t20·(|a|+|b|).

    Every emitted pair is EXACTLY verified (precision 1 by
    construction). Completeness combines the prefix theorem (exact)
    with a MinHash band conjunct on the candidate key (probabilistic —
    miss bound (1-J^4)^8, <= 3e-5 at this corpus's measured J >= 0.92
    true pairs; see :func:`prefix_candidate_pairs`). The oracle runs
    the exhaustive join with deterministic permutations, so the hash
    match IS the completeness check on real data every round.

    ``partition_cols`` scopes the join (and the oracle) to pairs that
    agree on those columns — the within-ingest-partition dedup pattern
    (cross-partition near-dup is the minhash/cross_near_dups family).
    This synthetic corpus draws from a ~6k-shingle vocabulary, so even
    rarity-ordered prefixes collide broadly (measured: 7.6M candidates
    over 5k docs corpus-wide at sf0.1 — 61% of all pairs, the dense
    vocabulary defeats rarity prefixes alone); partitioning by source keeps
    the candidate set proportional to Σ per-partition n², which is the
    deployment shape anyway.

    min_jaccard must be a multiple of 0.05 — thresholds are evaluated
    as 20·c ≥ t20·(|a|+|b|−c) in BIGINTs, never in floats.

    100 TB shape: shingle df is one hash agg; ranking is a window over
    each doc's ~dozens of shingles; the candidate join keys on the
    RAREST content in the corpus (self-skew-resistant by construction)
    plus the partition columns; verify joins candidates back to
    shingle rows and counts matches — no arrays cross a shuffle.
    """
    t20 = int(round(min_jaccard * 20))
    assert abs(min_jaccard * 20 - t20) < 1e-9, "min_jaccard must be a multiple of 0.05"
    sh, arrays, cand = prefix_candidate_pairs(
        docs, min_jaccard, id_col, text_col, k, partition_cols
    )
    # verify strategy is adaptive on the measured shingle-table size
    # (sh is checkpointed — the count is a cached-RDD read):
    n_sh_rows = sh.count()
    if n_sh_rows * 8 < BROADCAST_BYTES_CAP:
        # broadcast regime: attach each side's full hash array via two
        # broadcast joins and count the intersect per pair directly.
        # The arrays come from the candidate build's checkpointed
        # per-doc frame — ONE transform over ~docs rows strips the
        # (df, h) rank structs down to plain bigint arrays. That strip
        # is load-bearing: array_intersect on STRUCT elements has no
        # hash-set fast path (quadratic, interpreted equality per
        # element pair — measured: minutes at sf0.1 vs seconds on
        # bigint arrays). The shingle-row join below fans every
        # candidate out to ~|set| rows before re-collapsing (measured
        # at sf0.1: a 12 M row intermediate for 85k candidates, 64
        # CPU-s); the array attach reuses the checkpointed arrays
        # frame — no extra aggregate over the shingle table
        ha = arrays.select(
            F.col(id_col),
            F.transform("__arr", lambda x: x["h"]).alias("__ha"))
        a = F.broadcast(ha.select(
            F.col(id_col).alias("id_a"), F.col("__ha").alias("__ha_a")))
        b = F.broadcast(ha.select(
            F.col(id_col).alias("id_b"), F.col("__ha").alias("__ha_b")))
        common = cand.join(a, "id_a").join(b, "id_b").select(
            "id_a", "id_b", "sa", "sb",
            F.size(F.array_intersect("__ha_a", "__ha_b")).alias("c"),
        )
    else:
        # 100 TB regime: count common shingles per candidate pair via
        # the shingle-row join — no arrays ever cross a shuffle
        common = (
            cand.join(sh.select(F.col(id_col).alias("id_a"), "h"), "id_a")
            .join(sh.select(F.col(id_col).alias("id_b"), "h"), ["id_b", "h"])
            .groupBy("id_a", "id_b", "sa", "sb")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    # sizes came through the candidate pairs — no sizes joins here
    return (
        common
        # 20c ≥ t20·(sa+sb−c)  ⟺  c/(sa+sb−c) ≥ t — integer-exact
        .filter(F.lit(20) * F.col("c") >= F.lit(t20) * (F.col("sa") + F.col("sb") - F.col("c")))
        .select(
            "id_a", "id_b", F.col("c").alias("n_common"),
            F.round(
                F.col("c").cast("double")
                / (F.col("sa") + F.col("sb") - F.col("c")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


# Band layout for the prefix-candidate MinHash conjunct: b bands of r
# minima each (r*b = 32 permutations, folded into the per-doc shingle
# aggregate). Chosen against the measured pair-Jaccard landscape of the
# corpus (r8): candidate junk sits at J in [0.05, 0.15] — P(a junk pair
# shares a band) = 1-(1-J^4)^8 ~ 8e-4 at J=0.1 — while every true
# output pair measures J >= 0.92, where P(missing all 8 bands) =
# (1-J^4)^8 <= 3e-5. At the exact threshold J=0.7 the miss bound is
# (1-0.24)^8 ~ 11%: the conjunct is probabilistically complete, with
# the operator's exactness statement below amended accordingly.
_BAND_R = 4
_BAND_B = 8


def _rarity_build(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    pcols: list[str],
    memo: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Shared xxhash64 shingle-set build for the prefix-filter family
    (:func:`prefix_candidate_pairs` and :func:`containment_pairs`):
    returns ``(sh, arrays)`` — the (id, h) inverted-index stream and
    the per-doc rarity-sorted array frame (``__arr`` struct array,
    ``sz``, MinHash band signatures ``__bands``, plus ``pcols``).
    Session-memoized (sets and arrays checkpoints) so a suite that
    runs both the Jaccard and the containment join pays the corpus
    aggregate once.

    xxhash64, not the oracle-parity md5 h32: the hash only needs to
    (a) give SOME total order for the rarity ranking — the
    prefix-filter completeness theorem holds for any order — and (b)
    preserve distinctness for the intersect counts, where 64 bits beat
    h32's 32 (the oracles intersect raw strings). The md5→hex→conv
    pipeline was 11 of this stage's 19 CPU-s at sf0.1.

    The 32 MinHash minima ride the SAME aggregate as the shingle set
    (min over the position multiset == min over the distinct set, so
    no distinct pass is added); consumers that don't need the band
    conjunct simply ignore ``__bands``."""
    base = docs.select(F.col(id_col), *[F.col(c) for c in pcols], F.col(text_col))

    def build_sets() -> DataFrame:
        norm = base.select(
            F.col(id_col), normalized(F.col(text_col)).alias("__t")
        ).filter(F.length("__t") >= k)
        norm = norm.repartition(barrier_width(norm))
        toks = norm.select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), F.length("__t") - (k - 1))).alias("__p"),
            "__t",
        ).select(
            F.col(id_col),
            F.xxhash64(F.col("__t").substr(F.col("__p"), F.lit(k))).alias("h"),
        )
        return (
            toks.groupBy(id_col).agg(
                F.collect_set("h").alias("__hs"),
                *[
                    F.min(F.xxhash64(F.col("h"), F.lit(j))).alias(f"__m{j}")
                    for j in range(_BAND_R * _BAND_B)
                ],
            )
            .localCheckpoint(eager=True)
        )

    if memo:
        sets = DEDUP_MEMO.get_or_build(
            ("xxsets", frame_key(docs), id_col, text_col, k), build_sets)
    else:
        sets = build_sets()

    # (id, h) stream re-derived map-only from the per-doc checkpoint;
    # shared by the df aggregate and the non-broadcast verify regimes
    sh = sets.select(F.col(id_col), F.explode("__hs").alias("h"))

    # r=4 rows per band, b=8 bands: sig_i = hash of the band's minima.
    # A J >= t pair agrees on a band iff all r minima match (P = J^r
    # per band); sig collisions only ADD candidates (verify rejects),
    # never lose one.
    band_sigs = F.array(
        *[
            F.xxhash64(
                *[F.col(f"__m{i * _BAND_R + j}") for j in range(_BAND_R)],
                F.lit(i),
            )
            for i in range(_BAND_B)
        ]
    )

    def build_arrays() -> DataFrame:
        # vocabulary-sized (6k rows here, charset-bounded in general):
        # checkpoint BEFORE counting so the size-hint count reads the
        # materialized frame instead of re-running the explode+aggregate
        # over the shingle stream (~3 CPU-s at sf0.1)
        dfreq = (
            sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
            .localCheckpoint(eager=True)
        )
        dfreq = size_hinted(dfreq, dfreq.count() * 16)
        # bands ride the exploded rows into the per-doc aggregate (every
        # row of a doc carries the same array, F.first picks it) — a
        # docs×docs join here would SMJ two stat-less checkpoint frames,
        # and bands are corpus-sized so broadcasting them would not scale
        sh_b = sets.select(
            F.col(id_col), F.explode("__hs").alias("h"),
            band_sigs.alias("__bands"))
        arr = (
            sh_b.join(dfreq, "h")
            .groupBy(id_col)
            .agg(
                F.sort_array(F.collect_list(F.struct("df", "h"))).alias("__arr"),
                F.count(F.lit(1)).alias("sz"),
                F.first("__bands").alias("__bands"),
            )
        )
        if pcols:
            arr = arr.join(base.select(id_col, *pcols), id_col)
        # bounded: one row per doc (arr ≈ the doc's shingle set)
        return arr.localCheckpoint(eager=True)

    if memo:
        arrays = DEDUP_MEMO.get_or_build(
            ("xxarrays", frame_key(docs), id_col, text_col, k, tuple(pcols)),
            build_arrays)
    else:
        arrays = build_arrays()
    return sh, arrays


def prefix_candidate_pairs(
    docs: DataFrame,
    min_jaccard: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 7,
    partition_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Candidate-generation stage of :func:`prefix_filtered_pairs`.
    Returns (shingle rows, per-doc arrays frame, candidate id pairs) so
    callers — the verify stage, and the scale probe's candidates/sec
    metric — share one build.

    Candidate COUNT is the operator's true scale variable: verify cost
    is proportional to it. The prefix filter alone is provably complete
    but collapses on a closed vocabulary (the r7 probe measured 85k →
    9.2M candidates at 10× data — "rare" shingles stop being rare when
    thousands of docs share them), so the candidate join carries a
    second, INDEPENDENT conjunct: a MinHash band agreement
    (``arrays_overlap`` over b=8 band signatures of r=4 minima each,
    see ``_BAND_R``/``_BAND_B``). Completeness argument: the prefix
    theorem guarantees a shared prefix shingle for every J >= t pair;
    the band conjunct passes such a pair unless ALL 8 bands differ,
    P = (1-J^4)^8 — <= 3e-5 for the J >= 0.92 pairs this corpus
    actually contains (measured r8, all SFs), ~11% worst-case at
    exactly J = 0.7. The oracle remains the EXHAUSTIVE join and the
    minima are deterministic (fixed xxhash64 permutations), so the
    driver hash check decides completeness on the real data each
    round, not the bound. Junk pairs (J in [0.05, 0.15] here) share a
    band with P <= 8e-4, so the conjunct removes the quadratic junk
    term from the candidate SET while the join evaluates it
    streamingly (no 9.2M-row materialization).

    Plan shape (r7 restructure, 43 → ~25 CPU-s at sf0.1): on local[32]
    attributed CPU tracks the NUMBER of wide shuffle passes over the
    shingle table far more than per-row work, so the build never
    exchanges a shingle-sized frame at all. A doc's exploded shingle
    rows stay inside one partition (explode doesn't split a row), so
    ``collect_set(h)`` per doc collapses MAP-SIDE and its exchange
    carries one array row per doc; document frequency aggregates the
    re-exploded per-doc sets keyed on h (map-side partials are bounded
    by the k-shingle vocabulary per partition); and the final per-doc
    aggregate collects (df, h) pairs into a sort_array'd struct array
    (rank = array position, the same (df asc, h asc) rarity order the
    old row_number window produced), again collapsing map-side. Every
    exchange is ~docs-sized or ~vocab-sized; everything downstream —
    prefix explode, candidate join, verify arrays — derives from the
    checkpointed per-doc arrays frame. ``collect_set(h)`` also IS the
    distinct-(id, h) contract (h32 collisions count once), matching
    the oracle's SELECT DISTINCT."""
    t20 = int(round(min_jaccard * 20))
    pcols = partition_cols or []
    sh, arrays = _rarity_build(docs, id_col, text_col, k, pcols)

    # prefix length p = |s| - ceil(t·|s|) + 1; rank = position in the
    # rarity-sorted array (struct sort = (df asc, h asc), exactly the
    # old row_number order — h is distinct per doc so there are no ties)
    p = (F.col("sz") - F.ceil(F.lit(min_jaccard) * F.col("sz")) + 1).cast("int")
    prefix = arrays.select(
        F.col(id_col), "sz", "__bands", *[F.col(c) for c in pcols],
        F.posexplode(F.slice("__arr", F.lit(1), p)).alias("__pos", "__e"),
    ).select(
        F.col(id_col), "sz", "__bands", *[F.col(c) for c in pcols],
        (F.col("__pos") + 1).alias("rk"), F.col("__e.h").alias("h"),
    )

    a = prefix.select(
        F.col(id_col).alias("id_a"), F.col("h"),
        F.col("rk").alias("rk_a"), F.col("sz").alias("sa"),
        F.col("__bands").alias("__bands_a"),
        *[F.col(c) for c in pcols],
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"), F.col("h"),
        F.col("rk").alias("rk_b"), F.col("sz").alias("sb"),
        F.col("__bands").alias("__bands_b"),
        *[F.col(c) for c in pcols],
    )
    overlap_bound = F.lit(1) + F.least(
        F.col("sa") - F.col("rk_a"), F.col("sb") - F.col("rk_b")
    )
    cand = (
        a.join(b, ["h", *pcols])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # length filter (both directions)
            & (F.lit(20) * F.col("sb") >= F.lit(t20) * F.col("sa"))
            & (F.lit(20) * F.col("sa") >= F.lit(t20) * F.col("sb"))
            # positional filter
            & (overlap_bound * F.lit(20 + t20) >= F.lit(t20) * (F.col("sa") + F.col("sb")))
            # MinHash band conjunct: evaluated streamingly inside the
            # join, so the quadratic prefix-match enumeration never
            # materializes — the candidate SET is what survives here
            & F.arrays_overlap("__bands_a", "__bands_b")
        )
        # sa/sb ride along (functionally dependent on the ids), so the
        # verify tail never joins sizes back on — two fewer exchanges
        .select("id_a", "id_b", "sa", "sb")
        .distinct()
        # consumed twice by the verify joins — cut the DAG here
        .localCheckpoint(eager=True)
    )
    return sh, arrays, cand


def containment_pairs(
    docs: DataFrame,
    min_containment: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 7,
    partition_cols: list[str] | None = None,
    memo: bool = True,
) -> DataFrame:
    """EXACT containment join: directed pairs (a, b) with
    C(a→b) = |Sa ∩ Sb| / |Sa| ≥ t over k-char shingle sets — the
    ASYMMETRIC similarity that catches near-SUBSET duplication
    (a quoted wholesale inside b, boilerplate-wrapped reposts) which
    Jaccard structurally misses: a small doc inside a large one has
    J ≈ |Sa|/|Sb| ≪ t while C(a→b) = 1.

    Candidate generation is prefix filtering on the CONTAINED side
    only, and is provably complete with no probabilistic conjunct:
    order shingles by corpus rarity (df asc, h asc) and keep a's first
    ``pa = |Sa| - ceil(t·|Sa|) + 1`` as its prefix; if a shares none
    of its prefix with b then |Sa ∩ Sb| ≤ |Sa| - pa = ceil(t·|Sa|) - 1
    < t·|Sa| (pigeonhole — holds against ANY b, so b's side joins the
    FULL inverted index, no symmetric prefix needed). Two integer
    prunes run inside the join: size (20·|Sb| ≥ t20·|Sa| — b can't
    contain a's overlap otherwise) and positional (from a's matched
    prefix rank, (1 + |Sa| - rk_a)·20 ≥ t20·|Sa|). Every candidate is
    exactly verified, so precision is 1 and completeness is the
    theorem — the oracle still runs the EXHAUSTIVE join as the
    data-level proof.

    Thresholds are evaluated as 20·c ≥ t20·|Sa| in BIGINTs;
    ``min_containment`` must be a multiple of 0.05.

    ``partition_cols`` scopes the join (and the oracle) to pairs that
    agree on those columns — the within-ingest-partition shape, same
    concession :func:`prefix_filtered_pairs` makes on this corpus: the
    synthetic closed vocabulary gives every "rare" shingle df in the
    hundreds, so unscoped candidates degrade toward all-pairs
    (measured at sf0.1: ~5,200 CPU-s unscoped vs ~60 scoped). On open
    vocabularies (the production case) rare prefixes have df ≈ 1 and
    the unscoped join is candidate-bound on true near-subset pairs.

    100 TB shape: same build discipline as :func:`prefix_candidate_
    pairs` (map-side set collapse, vocab-sized df aggregate, per-doc
    rarity arrays; no shingle-sized exchange) — and literally the SAME
    memoized build (:func:`_rarity_build`), so a suite running both
    the Jaccard and the containment join pays the corpus aggregate
    once; the candidate join keys on a's rarest content plus the
    partition columns; the b-side index is the rank-carrying explode
    of the per-doc arrays, shuffled once on h. Verify is adaptive:
    Arrow gather over broadcast per-doc bitmaps when the corpus fits
    the gate (exact popcount intersections, see the inline note),
    broadcast array-intersect when only the hash payload fits, and
    the shingle-row count join at full scale."""
    t20 = int(round(min_containment * 20))
    assert abs(min_containment * 20 - t20) < 1e-9, (
        "min_containment must be a multiple of 0.05")
    pcols = partition_cols or []

    def build() -> DataFrame:
        sh, arrays = _rarity_build(docs, id_col, text_col, k, pcols, memo=memo)
        pa = (F.col("sz") - F.ceil(F.lit(min_containment) * F.col("sz")) + 1).cast("int")
        prefix_a = arrays.select(
            F.col(id_col).alias("id_a"), F.col("sz").alias("sa"),
            *[F.col(c) for c in pcols],
            F.posexplode(F.slice("__arr", F.lit(1), pa)).alias("__pos", "__e"),
        ).select(
            "id_a", "sa", *[F.col(c) for c in pcols],
            (F.col("__pos") + 1).alias("rk_a"),
            F.col("__e.h").alias("h"),
        )
        # the b-side index carries each shingle's RANK in b's rarity
        # order (posexplode of the same per-doc array the a-prefix
        # comes from, replacing the rank-less (id, h) stream + sizes
        # join) so the TWO-SIDED positional filter below can run.
        inv_b = arrays.select(
            F.col(id_col).alias("id_b"), F.col("sz").alias("sb"),
            *[F.col(c) for c in pcols],
            F.posexplode("__arr").alias("__pos", "__e"),
        ).select(
            "id_b", "sb", *[F.col(c) for c in pcols],
            (F.col("__pos") + 1).alias("rk_b"),
            F.col("__e.h").alias("h"),
        )
        # r14: broadcast the PREFIX side when its runtime-measured size
        # fits the cap. The prefix stream is ~(1-t)·n_sh + n_docs rows
        # (~1/5 of the inverted index at t=0.8), so hashing IT and
        # streaming the big index beats shuffling both sides into a
        # sort-merge join — interleaved A/B at sf0.1, 3 reps:
        # candidate subplan 1.6-2.1 s / 12.6-15.0 CPU-s (SMJ) →
        # 1.2-1.3 s / 5.6-8.0 CPU-s (BHJ, build = prefix). Estimate:
        # n_sh·14 B ≈ 0.25 fraction × 56 B/row; past the cap the hint
        # degrades to the planner's choice (the 100 TB regime).
        n_sh_rows = sh.count()
        prefix_a = size_hinted(prefix_a, n_sh_rows * 14,
                               cap=BROADCAST_BYTES_CAP)
        cand = (
            # partition columns are part of the JOIN KEY — equality as
            # a post-join filter would still enumerate every cross-
            # partition prefix match
            prefix_a.join(inv_b, ["h", *pcols])
            .filter(
                (F.col("id_a") != F.col("id_b"))
                & (F.lit(20) * F.col("sb") >= F.lit(t20) * F.col("sa"))
                # two-sided positional filter (Xiao et al. PPJoin,
                # containment form): both docs' arrays share ONE global
                # (df, h) order, so every common shingle of a
                # qualifying pair sits at or after its FIRST common
                # shingle's position in BOTH docs — overlap ≤ 1 +
                # min(sa − rk_a, sb − rk_b) at that first match. The
                # first common shingle is always inside a's prefix
                # when the pair qualifies (prefix theorem), so the
                # qualifying pair always survives via that row;
                # non-first matches may pass spuriously (bound not
                # tight there), which only ADDS candidates. EXACTLY
                # complete — no probabilistic conjunct. On open
                # vocabularies this is the standard PPJoin prune; on
                # THIS closed-vocab corpus its power is modest
                # (435k → 390k candidates at sf0.1 — shared shingles
                # are rare in BOTH docs' orders), which is why the
                # verify below is the vectorized gather, not a join.
                & ((F.lit(1) + F.least(
                        F.col("sa") - F.col("rk_a"),
                        F.col("sb") - F.col("rk_b"))) * F.lit(20)
                   >= F.lit(t20) * F.col("sa"))
            )
            .select("id_a", "id_b", "sa")
            .distinct()
            .localCheckpoint(eager=True)
        )
        gathered = None
        if n_sh_rows * 8 < BROADCAST_BYTES_CAP:
            # ARROW GATHER VERIFY (same move as the MinHash bitmap
            # regime, minhash_near_dups above): the closed-vocabulary
            # corpus makes the candidate set ~60% of all in-source
            # pairs (390k at sf0.1 for 14 outputs — no exact filter
            # prunes it, see the positional-filter note), so per-pair
            # verify cost IS the operator's cost. array_intersect over
            # two broadcast joins measured ~47 CPU-s; the same
            # intersection as bitmap popcounts over the corpus
            # vocabulary is vectorizable end-to-end: assign each
            # distinct shingle hash its rank in the sorted vocab (bit
            # index — injective, so popcount(AND) == |∩| EXACTLY),
            # build per-doc bitmap words ONCE driver-side (bounded by
            # this regime's gate), broadcast, and gather+AND+popcount
            # per Arrow batch. The UDF emits only exact integers
            # (c, sa) screened by the exact integer threshold; the
            # authoritative filter + round run JVM-side on those
            # integers, so results are bit-equal to the join verify.
            import numpy as np

            ha = (
                arrays.select(
                    F.col(id_col),
                    F.transform("__arr", lambda x: x["h"]).alias("__ha"))
                .toPandas()
                .sort_values(id_col)
            )
            ids_np = np.ascontiguousarray(ha[id_col].to_numpy(np.int64))
            lens = ha["__ha"].map(len).to_numpy(np.int64)
            flat = np.concatenate(ha["__ha"].to_list()).astype(np.int64) \
                if len(ha) else np.empty(0, np.int64)
            vocab = np.unique(flat)
            n_words = (len(vocab) + 63) // 64
            if len(ids_np) * n_words * 8 < BROADCAST_BYTES_CAP:
                bit = np.searchsorted(vocab, flat)
                doc_idx = np.repeat(np.arange(len(ids_np)), lens)
                wbits = np.zeros((len(ids_np), n_words), np.uint64)
                np.bitwise_or.at(
                    wbits, (doc_idx, bit >> 6),
                    np.uint64(1) << (bit & 63).astype(np.uint64))
                bc = cand.sparkSession.sparkContext.broadcast(
                    (ids_np, lens, wbits))
                par = cand.sparkSession.sparkContext.defaultParallelism
                n_cand = cand.count()  # cheap: cand is checkpointed
                # ~100k pairs/task (each ~6 µs of numpy), capped at the
                # session's width; no max(par, ...) floor — a fresh
                # python worker costs ~0.5-2 CPU-s of interpreter +
                # import spin-up, so fanning a 390k-pair stage to 32
                # tasks burns more on worker spin-up than the popcounts
                # themselves when the pool isn't already warm (r14: was
                # 50k/task; the wider stage paid 8 workers of spin-up
                # per bench pass for ~0.3 s of compute each)
                width = max(1, min(n_cand // 100_000 + 1, 8 * par))

                def gen(batches):
                    # mapInArrow, not mapInPandas (r14): the worker
                    # then imports only pyarrow + numpy — pandas is
                    # ~1.5-2 CPU-s of the spin-up this stage pays
                    # whenever the worker pool is cold (each bench
                    # pass, after 190 other rows churned the pool)
                    import numpy as np
                    import pyarrow as pa

                    ids, nsz, words = bc.value
                    pop8 = np.unpackbits(
                        np.arange(256, dtype=np.uint8)[:, None], axis=1
                    ).sum(axis=1).astype(np.int64)
                    n_ids = len(ids)
                    for batch in batches:
                        ia = batch.column(0).to_numpy(
                            zero_copy_only=False).astype(np.int64)
                        ib = batch.column(1).to_numpy(
                            zero_copy_only=False).astype(np.int64)
                        a = np.searchsorted(ids, ia)
                        b = np.searchsorted(ids, ib)
                        if (
                            (a >= n_ids).any() or (b >= n_ids).any()
                            or (ids[a.clip(0, n_ids - 1)] != ia).any()
                            or (ids[b.clip(0, n_ids - 1)] != ib).any()
                        ):
                            raise ValueError(
                                "candidate id missing from the arrays "
                                "side table — candidates must come "
                                "from the same corpus build"
                            )
                        inter = (
                            pop8[(words[a] & words[b]).view(np.uint8)]
                            .reshape(len(ia), -1)
                            .sum(axis=1, dtype=np.int64)
                        )
                        sa = nsz[a]
                        keep = 20 * inter >= t20 * sa  # integer-exact
                        yield pa.RecordBatch.from_arrays(
                            [
                                pa.array(ia[keep], type=pa.int64()),
                                pa.array(ib[keep], type=pa.int64()),
                                pa.array(sa[keep], type=pa.int64()),
                                pa.array(inter[keep], type=pa.int64()),
                            ],
                            names=["id_a", "id_b", "sa", "c"],
                        )

                gathered = cand.select("id_a", "id_b").repartition(
                    width
                ).mapInArrow(
                    gen, schema="id_a long, id_b long, sa long, c long"
                )
            if gathered is not None:
                common = gathered
            else:
                # vocab too wide for per-doc bitmaps: broadcast the
                # plain bigint hash arrays and intersect per pair
                # (array_intersect on STRUCT elements has no hash-set
                # fast path — hence the strip, see
                # prefix_filtered_pairs)
                haf = arrays.select(
                    F.col(id_col),
                    F.transform("__arr", lambda x: x["h"]).alias("__ha"))
                a = F.broadcast(haf.select(
                    F.col(id_col).alias("id_a"), F.col("__ha").alias("__ha_a")))
                b = F.broadcast(haf.select(
                    F.col(id_col).alias("id_b"), F.col("__ha").alias("__ha_b")))
                common = cand.join(a, "id_a").join(b, "id_b").select(
                    "id_a", "id_b", "sa",
                    F.size(F.array_intersect("__ha_a", "__ha_b")).alias("c"),
                )
        else:
            common = (
                cand.join(sh.select(F.col(id_col).alias("id_a"), "h"), "id_a")
                .join(sh.select(F.col(id_col).alias("id_b"), "h"), ["id_b", "h"])
                .groupBy("id_a", "id_b", "sa")
                .agg(F.count(F.lit(1)).alias("c"))
            )
        return (
            common
            # 20c ≥ t20·sa  ⟺  c/sa ≥ t — integer-exact
            .filter(F.lit(20) * F.col("c") >= F.lit(t20) * F.col("sa"))
            .select(
                "id_a", "id_b", F.col("c").alias("n_common"),
                F.round(
                    F.col("c").cast("double") / F.col("sa").cast("double"), 6
                ).alias("containment"),
            )
        )

    if not memo:
        return build()
    key = ("containment", frame_key(docs), id_col, text_col,
           float(min_containment), k, tuple(pcols))
    return DEDUP_MEMO.get_or_build(
        key, lambda: build().localCheckpoint(eager=True)
    )


def containment_pairs_sql(
    table: str = "documents", min_containment: float = 0.8,
    id_col: str = "doc_id", text_col: str = "text", k: int = 7,
    partition_cols: list[str] | None = None,
) -> str:
    """Oracle twin of :func:`containment_pairs` — the EXHAUSTIVE
    directed co-occurrence join on raw shingle STRINGS (no prefix/
    size/positional filters), so equality with the Spark result proves
    the filters drop nothing (same contract as
    :func:`prefix_filtered_pairs_sql`)."""
    t20 = int(round(min_containment * 20))
    pcols = partition_cols or []
    pc_sel = "".join(f", {c}" for c in pcols)
    part_join = "".join(f" AND a.{c} = b.{c}" for c in pcols)
    norm = normalized_sql(text_col)
    return f"""
    WITH sh AS (
      SELECT DISTINCT {id_col} AS id{pc_sel}, s AS h FROM (
        SELECT {id_col}{pc_sel}, unnest(list_distinct(list_transform(
          range(1, len({norm}) - {k - 2}),
          i -> substr({norm}, CAST(i AS INT), {k})))) AS s
        FROM {table}
        WHERE len({norm}) >= {k}
      )
    ),
    sz AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY 1),
    co AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.h = b.h AND a.id <> b.id{part_join}
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, c AS n_common,
           round(CAST(c AS DOUBLE) / CAST(sa.sz AS DOUBLE), 6) AS containment
    FROM co
    JOIN sz sa ON co.id_a = sa.id
    WHERE 20 * c >= {t20} * sa.sz
    """


def prefix_filtered_pairs_sql(
    table: str = "documents", min_jaccard: float = 0.7,
    id_col: str = "doc_id", text_col: str = "text", k: int = 7,
    partition_cols: list[str] | None = None,
) -> str:
    """Oracle twin of :func:`prefix_filtered_pairs` — deliberately the
    EXHAUSTIVE co-occurrence join (no prefix/length/positional
    filters), so equality with the Spark result proves the filters
    drop nothing. The oracle intersects raw shingle STRINGS (exact
    ground truth); the engine's xxhash64 values agree unless xxhash64
    itself collides, which the hash compare would surface. (Until r6
    both sides counted md5-h32 values, whose 32-bit collisions — ~200
    expected at sf0.1's 1.3 M distinct shingles — quietly merged
    shingles on both sides; string semantics are strictly more
    exact.)"""
    t20 = int(round(min_jaccard * 20))
    pcols = partition_cols or []
    # partition equality via the per-doc columns carried into sh
    pc_sel = "".join(f", {c}" for c in pcols)
    part_join = "".join(f" AND a.{c} = b.{c}" for c in pcols)
    norm = normalized_sql(text_col)
    return f"""
    WITH sh AS (
      SELECT DISTINCT {id_col} AS id{pc_sel}, s AS h FROM (
        SELECT {id_col}{pc_sel}, unnest(list_distinct(list_transform(
          range(1, len({norm}) - {k - 2}),
          i -> substr({norm}, CAST(i AS INT), {k})))) AS s
        FROM {table}
        WHERE len({norm}) >= {k}
      )
    ),
    sz AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY 1),
    co AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.h = b.h AND a.id < b.id{part_join}
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, c AS n_common,
           round(CAST(c AS DOUBLE) / CAST(sa.sz + sb.sz - c AS DOUBLE), 6)
             AS jaccard
    FROM co
    JOIN sz sa ON co.id_a = sa.id
    JOIN sz sb ON co.id_b = sb.id
    WHERE 20 * c >= {t20} * (sa.sz + sb.sz - c)
    """
