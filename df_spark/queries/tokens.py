"""Corpus-scale token pipelines: global term frequencies and TF-IDF
top terms — the classic word-count / feature-weighting passes of an
LLM-data pipeline (explode → hash aggregate; one shuffle on the term).

IDF uses the rational form N/df instead of ln(N/df): libm logarithm
rounding is not guaranteed identical across engines, division is —
keeps the oracle exact. Rankings are unaffected (monotone transform).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.text import (
    bpe_token_count,
    bpe_token_count_sql,
    normalized,
    normalized_sql,
)
from ..operators.partitioning import barrier_width
from ..sources.tables import load_sdf
from . import register

_TOPN = 100
_PER_DOC = 3
_DOC_LIMIT = 20


def _tokens_sdf(spark, sf_dir):
    docs = load_sdf(spark, sf_dir, "documents")
    base = docs.select("doc_id", normalized(F.col("text")).alias("__t"))
    base = base.repartition(barrier_width(base))
    return base.select(
        "doc_id", F.explode(F.split(F.col("__t"), " ")).alias("token")
    ).filter(F.col("token") != "")


_TOKENS_SQL = f"""
      SELECT doc_id, unnest(string_split({normalized_sql('text')}, ' ')) AS token
      FROM documents
"""


@register(
    "token_freq",
    sql=f"""
    WITH tok AS ({_TOKENS_SQL})
    SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM tok WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT {_TOPN}
    """,
)
def token_freq(spark, sf_dir):
    tok = _tokens_sdf(spark, sf_dir)
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"), F.count_distinct("doc_id").alias("n_docs"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(_TOPN)
    )


@register(
    "tfidf_top_terms",
    sql=f"""
    WITH tok AS ({_TOKENS_SQL}),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM tok WHERE token <> '' GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok WHERE token <> '' GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             round(CAST(tf.tf AS DOUBLE) * n.n_docs / df.df, 6) AS tfidf
      FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
      WHERE tf.doc_id < {_DOC_LIMIT}
    )
    SELECT doc_id, token, tfidf, rank FROM (
      SELECT doc_id, token, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank
      FROM scored
    ) WHERE rank <= {_PER_DOC}
    """,
)
def tfidf_top_terms(spark, sf_dir):
    # tf and df from one token table; the df side is vocabulary-sized
    # (scales with the corpus), so its join is AQE-decided, not forced;
    # per-doc top terms via window
    tok = _tokens_sdf(spark, sf_dir)
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = load_sdf(spark, sf_dir, "documents").count()
    scored = (
        tf.filter(F.col("doc_id") < _DOC_LIMIT)
        .join(df, "token")
        .select(
            "doc_id",
            "token",
            F.round(F.col("tf").cast("double") * n_docs / F.col("df"), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _PER_DOC)
        .select("doc_id", "token", "tfidf", "rank")
    )


_PACK_CAPACITY = 2048


@register(
    "pack_sequences",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, lang, {bpe_token_count_sql('text')} AS n_tokens
      FROM documents
    )
    SELECT doc_id, lang, n_tokens,
           CAST(SUM(n_tokens) OVER w - n_tokens AS BIGINT) AS token_offset,
           CAST((SUM(n_tokens) OVER w - n_tokens) // {_PACK_CAPACITY} AS BIGINT) AS bin_id
    FROM toks
    WINDOW w AS (PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def pack_sequences(spark, sf_dir):
    # Sequence packing for pretraining batches: docs are laid out in a
    # deterministic per-shard order (here: doc_id within lang) and each
    # doc gets its token offset and its 2048-token bin. The running sum
    # is windowed PER SHARD, so shards pack in parallel — the 100 TB
    # layout packs within hash-bucketed shards (finer than lang) and
    # never sorts globally; a doc straddling a bin boundary belongs to
    # the bin its first token lands in (documented token-offset
    # semantics, identical in the oracle).
    docs = load_sdf(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select(
        "doc_id", "lang", bpe_token_count(F.col("text")).alias("n_tokens")
    )
    offset = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    return toks.select(
        "doc_id", "lang", "n_tokens", offset.alias("token_offset")
    ).withColumn("bin_id", F.expr(f"token_offset div {_PACK_CAPACITY}"))


@register(
    "bigram_lm_score",
    sql=f"""
    WITH base AS (
      SELECT doc_id, {normalized_sql('text')} AS t FROM documents
      WHERE len({normalized_sql('text')}) >= 2
    ),
    occ AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 1),
                                   i -> substr(t, CAST(i AS INT), 2))) AS bg
      FROM base
    ),
    per_doc AS (
      SELECT doc_id, bg, COUNT(*) AS m FROM occ GROUP BY 1, 2
    ),
    corpus AS (
      SELECT bg, CAST(SUM(m) AS BIGINT) AS cnt FROM per_doc GROUP BY 1
    ),
    ctx AS (
      SELECT substr(bg, 1, 1) AS c1, CAST(SUM(cnt) AS BIGINT) AS ctx_cnt
      FROM corpus GROUP BY 1
    )
    SELECT p.doc_id,
           CAST(SUM(p.m) AS BIGINT) AS n_bigrams,
           round(CAST(SUM(CAST(round(p.m * (CAST(c.cnt AS DOUBLE)
                                            / CAST(x.ctx_cnt AS DOUBLE)), 9)
                             AS DECIMAL(27, 9))) AS DOUBLE)
                 / CAST(SUM(p.m) AS DOUBLE), 6) AS lm_score
    FROM per_doc p
    JOIN corpus c ON p.bg = c.bg
    JOIN ctx x ON substr(p.bg, 1, 1) = x.c1
    GROUP BY p.doc_id
    """,
)
def bigram_lm_score(spark, sf_dir):
    """Character-bigram Markov LM fluency score — the CCNet-style
    "train a small LM on the corpus, score every document with it"
    quality pass, done entirely in-engine. The model is the corpus's
    own conditional bigram distribution P(c2|c1) = cnt(c1c2)/cnt(c1·);
    each document scores the mean conditional probability of its
    bigram occurrences. Low scores flag disfluent/garbage text the way
    high perplexity does (mean-probability rather than log-perplexity:
    libm ln() rounding is not guaranteed identical across engines,
    integer-ratio arithmetic is — same policy as TF-IDF above).

    Determinism: corpus and context counts are exact BIGINTs; each
    per-bigram term m·P is one IEEE double multiply of an exact ratio,
    rounded to 9 decimals and summed as DECIMAL (exact, associative —
    per-doc accumulation order cannot matter), then one final double
    divide rounded to 6.

    Scale shape: the occurrence table is corpus-sized but collapses
    immediately into the (doc_id, bigram) aggregate — one corpus-wide
    shuffle on a uniform composite key. The model itself (bigram and
    context-marginal tables) is vocabulary²-bounded, broadcast to the
    scorer; training-data scale changes only the one aggregate pass.
    """
    docs = load_sdf(spark, sf_dir, "documents")
    base = docs.select("doc_id", normalized(F.col("text")).alias("__t")).filter(
        F.length("__t") >= 2
    )
    base = base.repartition(barrier_width(base))
    idx = F.sequence(F.lit(1), F.length("__t") - 1)
    occ = base.select(
        "doc_id",
        F.explode(
            F.transform(idx, lambda i: F.substring(F.col("__t"), i, 2))
        ).alias("bg"),
    )
    # the (doc_id, bigram) aggregate feeds three consumers (scorer,
    # bigram model, context marginals) — materialize it once so the
    # corpus is exploded/aggregated a single time, not per consumer
    per_doc = (
        occ.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("m"))
        .localCheckpoint(eager=True)
    )
    corpus = per_doc.groupBy("bg").agg(F.sum("m").alias("cnt"))
    ctx = (
        corpus.select(F.substring("bg", 1, 1).alias("c1"), "cnt")
        .groupBy("c1")
        .agg(F.sum("cnt").alias("ctx_cnt"))
    )
    term = F.round(
        F.col("m") * (F.col("cnt").cast("double") / F.col("ctx_cnt").cast("double")),
        9,
    ).cast("decimal(27,9)")
    return (
        per_doc.join(F.broadcast(corpus), "bg")
        .join(F.broadcast(ctx), F.substring("bg", 1, 1) == F.col("c1"))
        .groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_bigrams"),
            F.round(
                F.sum(term).cast("double") / F.sum("m").cast("double"), 6
            ).alias("lm_score"),
        )
    )


@register(
    "doc_rarity",
    sql=f"""
    WITH tok AS ({_TOKENS_SQL}),
    tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    freq AS (SELECT token, COUNT(*) AS cnt FROM tok2 GROUP BY 1),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tok2)
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(f.cnt) AS BIGINT) AS total_freq,
           CAST(SUM(f.cnt) AS DOUBLE) / COUNT(*) AS mean_token_freq,
           CAST(SUM(CASE WHEN f.cnt >= nd.n_docs THEN 1 ELSE 0 END) AS BIGINT) AS n_common
    FROM tok2 t JOIN freq f ON t.token = f.token CROSS JOIN nd
    GROUP BY 1
    """,
)
def doc_rarity(spark, sf_dir):
    """Corpus-statistics document scoring — the quality-filter pass
    that drops documents dominated by ultra-common (boilerplate) or
    ultra-rare (garbage) tokens. Unlike text_stats (per-doc only),
    every token is scored against its whole-corpus frequency.

    Determinism: per-doc sums are over BIGINT corpus counts (exact,
    associative — no FP accumulation ordering); the only double is one
    final division. The common-token threshold is relative (count >=
    corpus doc count, i.e. "averages once per document") so the query
    is scale-invariant.

    Scale shape: the token table is corpus-sized but the frequency
    table is vocabulary-sized — AQE broadcasts it; the single
    corpus-wide shuffle is the per-doc aggregate on the uniform doc_id
    key. The n_docs scalar joins as a broadcast literal row, never a
    driver round-trip inside the plan.
    """
    tok = _tokens_sdf(spark, sf_dir)
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    nd = tok.agg(F.count_distinct("doc_id").alias("n_docs"))
    return (
        tok.join(freq, "token")
        .crossJoin(F.broadcast(nd))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("cnt").alias("total_freq"),
            (F.sum("cnt").cast("double") / F.count(F.lit(1))).alias(
                "mean_token_freq"
            ),
            F.sum(
                F.when(F.col("cnt") >= F.col("n_docs"), 1).otherwise(0)
            ).alias("n_common"),
        )
    )


_VOCAB_N = 50


@register(
    "vocab_oov_rate",
    sql=f"""
    WITH tok AS ({_TOKENS_SQL}),
    vc AS (
      SELECT token FROM (
        SELECT token, COUNT(*) AS n FROM tok WHERE token <> ''
        GROUP BY token ORDER BY n DESC, token LIMIT {_VOCAB_N}
      )
    ),
    per AS (
      SELECT t.doc_id,
             COUNT(*)::BIGINT AS n_tokens,
             CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov
      FROM tok t LEFT JOIN vc v USING (token)
      WHERE t.token <> ''
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens, n_oov,
           ((1000 * n_oov) // n_tokens)::BIGINT AS oov_permille
    FROM per
    """,
)
def vocab_oov_rate(spark, sf_dir):
    """Tokenizer-vocabulary coverage gate: fix the vocabulary to the
    corpus' top-{_VOCAB_N} tokens (count desc, token asc — fully
    deterministic under ties) and report each document's out-of-vocab
    token share in integer permille. This is the diagnostic run before
    committing to a tokenizer: docs with high OOV rates either predate
    the vocab's domain or are noise, and the same pass sizes how much
    of the corpus a candidate vocab actually covers.

    Scale shape: ONE token hash-aggregate builds the frequency table
    (map-side combine absorbs within-partition repeats), the top-N is
    a bounded take, and the vocab — bounded by construction — comes
    back as an InSet literal so the per-doc pass is scan-shaped with
    zero join (the stream_decontaminate probe pattern). The per-doc
    aggregate keys on doc_id: uniform, no skew. The oracle spells the
    same membership as a LEFT JOIN against the top-N CTE."""
    tok = _tokens_sdf(spark, sf_dir)
    vocab_rows = (
        tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(_VOCAB_N)
        .collect()
    )
    vocab = [r["token"] for r in vocab_rows]  # bounded: _VOCAB_N rows
    oov = F.when(F.col("token").isin(vocab), 0).otherwise(1)
    return (
        tok.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(oov).cast("long").alias("n_oov"),
        )
        .select(
            "doc_id", "n_tokens", "n_oov",
            F.expr("(1000 * n_oov) div n_tokens").alias("oov_permille"),
        )
    )
