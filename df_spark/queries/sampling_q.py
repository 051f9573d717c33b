"""Deterministic corpus-sampling queries over ``documents``.

Training-data curation needs reproducible draws: the same rows keep
on every run, on any engine — so the sample predicate is a content
hash of the id, never ``rand()``, and DuckDB verifies the exact row
set (not just the rate).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.sampling import (
    bernoulli_sample,
    keep_sql,
    mix_sources,
    mix_sources_sql,
    stratified_sample,
    stratified_sample_sql,
)
from ..functions import text as X
from ..operators import sampling as S
from ..sources.tables import load_sdf
from . import register

# downsample the dominant language, keep mid-resource ones, budget the
# tail — the canonical language-balance pass
STRATA_RATES = {"en": 0.3, "zh": 0.8, "es": 0.8, "de": 0.9, "fr": 1.0}


@register(
    "sample_stratified",
    sql="SELECT doc_id, lang FROM ("
    + stratified_sample_sql("documents", "lang", STRATA_RATES, "doc_id")
    + ")",
)
def sample_stratified(spark, sf_dir):
    docs = load_sdf(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang", STRATA_RATES, "doc_id").select(
        "doc_id", "lang"
    )


@register(
    "sample_bernoulli",
    sql=f"""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE {keep_sql('doc_id')} < 2500
    GROUP BY lang
    """,
)
def sample_bernoulli(spark, sf_dir):
    docs = load_sdf(spark, sf_dir, "documents")
    return (
        bernoulli_sample(docs, 0.25, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# non-uniform target over four sources (rest dropped): the feasibility
# cap makes src0 keep everything and the others downsample to the mix
MIX_WEIGHTS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}


@register(
    "source_mix",
    sql=f"""
    SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM ({mix_sources_sql('documents', MIX_WEIGHTS, 'doc_id')})
    GROUP BY source
    """,
)
def source_mix(spark, sf_dir):
    docs = load_sdf(spark, sf_dir, "documents")
    return (
        mix_sources(docs, MIX_WEIGHTS, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


_EXACT_K = 40


@register(
    "sample_exact_k",
    sql=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY {keep_sql('doc_id')}, doc_id) AS rn
      FROM documents
    ) WHERE rn <= {_EXACT_K}
    """,
)
def sample_exact_k(spark, sf_dir):
    # exactly-k-per-stratum sampling: rank docs by their id-hash draw
    # (doc_id tiebreak) and keep the first k — a deterministic uniform
    # sample of fixed SIZE, where the rate-based samplers give a fixed
    # PROBABILITY. One partitioned window (top-k per group shape), no
    # global sort; ranking by content hash means adding documents later
    # only displaces, never reshuffles, earlier picks.
    from pyspark.sql import Window as W

    from ..operators.sampling import _keep

    docs = load_sdf(spark, sf_dir, "documents")
    win = W.partitionBy("lang").orderBy(_keep("doc_id"), F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", F.row_number().over(win).alias("rn"))
        .filter(F.col("rn") <= _EXACT_K)
        .select("doc_id", "lang")
    )


@register(
    "sample_weighted",
    sql=f"""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE {S.weighted_sample_sql(X.quality_score_sql('text'), 'doc_id')}
    GROUP BY lang
    """,
)
def sample_weighted(spark, sf_dir):
    """Quality-weighted importance sampling: each doc survives with
    probability equal to its quality score — the one-pass, reproducible
    curriculum/downsampling op (vs the uniform `sample_bernoulli` and
    per-stratum `sample_stratified`). Deterministic hash draw; exact
    cross-engine because draw and weight compare as identical
    double products."""
    docs = load_sdf(spark, sf_dir, "documents")
    kept = S.weighted_sample(docs, X.quality_score(F.col("text")), "doc_id")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


_SPLIT_DENOM = 10_000
_TRAIN_LT = 9_000  # 90% train
_VAL_LT = 9_500    # 5% val; remainder test


@register(
    "train_val_split",
    sql=f"""
    SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT lang, n_chars,
             CASE WHEN {keep_sql('doc_id', _SPLIT_DENOM)} < {_TRAIN_LT}
                    THEN 'train'
                  WHEN {keep_sql('doc_id', _SPLIT_DENOM)} < {_VAL_LT}
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    GROUP BY 1, 2
    """,
)
def train_val_split(spark, sf_dir):
    """Deterministic 90/5/5 train/val/test assignment by content hash
    of the document id — the split every training pipeline needs to be
    LEAKAGE-PROOF: a document lands in the same split on every run, on
    every engine, at every corpus size (growing the corpus never moves
    an existing doc across splits, unlike rand() or modulo-row-number
    splits). Map-side only — the draw is a projection, no shuffle
    touches the corpus; the only exchange is the final bounded
    (split × lang) rollup."""
    from ..functions.hashing import h32

    docs = load_sdf(spark, sf_dir, "documents")
    draw = h32(F.col("doc_id").cast("string")) % _SPLIT_DENOM
    split = (
        F.when(draw < _TRAIN_LT, "train")
        .when(draw < _VAL_LT, "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# target token-share per language for the rebalance plan (sums to 1)
_MIX_TARGETS = [("en", 0.35), ("de", 0.20), ("es", 0.15), ("fr", 0.15), ("zh", 0.15)]


@register(
    "mix_rebalance",
    sql=f"""
    WITH tok AS (
      SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS toks
      FROM documents GROUP BY lang
    ),
    tgt (lang, share) AS (
      VALUES {", ".join(f"('{l}', {s})" for l, s in _MIX_TARGETS)}
    ),
    j AS (
      -- VALUES literals bind as DECIMAL in DuckDB; the Spark twin's
      -- dim is double-typed, so normalize before anything downstream
      SELECT lang, toks, CAST(share AS DOUBLE) AS share,
             CAST(toks AS DOUBLE) / CAST(share AS DOUBLE) AS cap
      FROM tok JOIN tgt USING (lang)
    ),
    n AS (SELECT MIN(cap) AS nstar FROM j)
    SELECT lang,
           toks AS available_tokens,
           share AS target_share,
           round(share * nstar / CAST(toks AS DOUBLE), 6) AS sample_rate,
           CAST(floor(share * nstar) AS BIGINT) AS planned_tokens
    FROM j CROSS JOIN n
    """,
)
def mix_rebalance(spark, sf_dir):
    """Corpus-mix rebalancing plan: given target token shares per
    language, find the largest total budget N* every language can
    supply at its share (N* = min over languages of available/share),
    then the per-language sampling rate and planned token count that
    hit the target mix exactly without upsampling anything.

    This is the planning half of weighted corpus mixing (the sampling
    half is ``sample_weighted``/``source_mix``): one hash aggregate
    over the corpus, a broadcast join against the bounded target dim,
    and a 1-row broadcast of the binding constraint — the corpus is
    scanned once regardless of scale. Determinism: available counts are
    exact BIGINTs, every ratio is a per-row IEEE double op on those
    aggregates, so both engines agree bit-for-bit."""
    docs = load_sdf(spark, sf_dir, "documents")
    tok = docs.groupBy("lang").agg(F.sum("n_chars").cast("long").alias("toks"))
    tgt = docs.sparkSession.createDataFrame(_MIX_TARGETS, "lang string, share double")
    j = tok.join(F.broadcast(tgt), "lang").select(
        "lang", "toks", "share",
        (F.col("toks").cast("double") / F.col("share")).alias("cap"),
    )
    n = j.agg(F.min("cap").alias("nstar"))
    return j.crossJoin(F.broadcast(n)).select(
        "lang",
        F.col("toks").alias("available_tokens"),
        F.col("share").alias("target_share"),
        F.round(
            F.col("share") * F.col("nstar") / F.col("toks").cast("double"), 6
        ).alias("sample_rate"),
        F.floor(F.col("share") * F.col("nstar")).cast("long").alias("planned_tokens"),
    )


_TEMP_SCALE = 1_000_000  # fixed-point scale for sqrt weights


@register(
    "mix_temperature",
    sql=f"""
    WITH tok AS (
      SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS toks
      FROM documents GROUP BY lang
    ),
    w AS (
      SELECT lang, toks,
             CAST(floor(sqrt(CAST(toks AS DOUBLE)) * {_TEMP_SCALE})
                  AS BIGINT) AS w_fx
      FROM tok
    ),
    tot AS (
      SELECT CAST(SUM(w_fx) AS BIGINT) AS w_tot,
             CAST(SUM(toks) AS BIGINT) AS toks_tot
      FROM w
    )
    SELECT lang, toks AS available_tokens,
           w_fx AS weight_fx,
           ((1000 * w_fx) // w_tot)::BIGINT AS share_permille,
           (((toks_tot // 2) * w_fx) // w_tot)::BIGINT AS quota_tokens,
           round(CAST((((toks_tot // 2) * w_fx) // w_tot) AS DOUBLE)
                 / CAST(toks AS DOUBLE), 6) AS sample_rate
    FROM w CROSS JOIN tot
    """,
)
def mix_temperature(spark, sf_dir):
    """Temperature-scaled corpus mixing (α = 0.5): per-language quotas
    proportional to available_tokens^α — the multilingual sampling
    standard (XLM-R §3.1 up-samples low-resource languages exactly
    this way) — against a budget of half the corpus. Flattening the
    size distribution is what keeps a 100-language corpus from being
    90% English.

    Determinism: the α-power runs ONCE per language on an exact
    BIGINT aggregate (sqrt is correctly-rounded IEEE, floor is exact),
    then is fixed-pointed to an integer weight — so the cross-language
    SUM, the permille shares, and the quotas are pure integer
    arithmetic with no float-summation order anywhere. The only
    emitted double (sample_rate) is a single per-row division of two
    exact integers, rounded once.

    Scale shape: one hash aggregate over the corpus (map-side
    combine), a 1-row total broadcast, and per-language row math —
    the corpus is scanned once regardless of scale; the actual
    sampling pass then rides sample_weighted/source_mix with these
    rates. Fixed-point headroom: budget × weight_fx must fit int64
    (ample at any benchmark SF; for a 1e14-token corpus drop
    _TEMP_SCALE to 1e3 or compute quotas per-million-tokens — both
    engines would raise on overflow rather than wrap, so the bound is
    checked, not assumed)."""
    docs = load_sdf(spark, sf_dir, "documents")
    tok = docs.groupBy("lang").agg(F.sum("n_chars").cast("long").alias("toks"))
    w = tok.select(
        "lang", "toks",
        F.floor(F.sqrt(F.col("toks").cast("double")) * _TEMP_SCALE)
        .cast("long").alias("w_fx"),
    )
    tot = w.groupBy().agg(
        F.sum("w_fx").cast("long").alias("w_tot"),
        F.sum("toks").cast("long").alias("toks_tot"),
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.col("toks").alias("available_tokens"),
            F.col("w_fx").alias("weight_fx"),
            F.expr("(1000 * w_fx) div w_tot").alias("share_permille"),
            F.expr("((toks_tot div 2) * w_fx) div w_tot").alias("quota_tokens"),
            F.round(
                F.expr("((toks_tot div 2) * w_fx) div w_tot").cast("double")
                / F.col("toks").cast("double"), 6
            ).alias("sample_rate"),
        )
    )
