"""Text-analysis column builders for large-scale corpus pipelines:
normalization, character shingles, token counts, heuristic language ID,
quality scoring, document fingerprints.

Everything is built from JVM-side ``pyspark.sql.functions`` (no Python
UDFs in the hot path) and has an exact DuckDB-SQL twin for the oracle.
Determinism rules: only string ops, integer arithmetic and +-*/ on
doubles (no exp/log whose libm rounding may differ across engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# token pattern for the BPE-ish sub-word count: letter runs, digit runs,
# or single non-alphanumeric marks (≈ GPT-2 pre-tokenizer shape)
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"
WORD_RE = r"\S+"

# marker stopwords per language for the n-gram/stopword heuristic; the
# CASE chain below breaks ties in this fixed order
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to "],
    "de": [" der ", " und ", " die ", " nicht "],
    "fr": [" le ", " la ", " et ", " les "],
    "es": [" el ", " que ", " los ", " una "],
    "zh": ["的", "是", "不", "了"],
}
LANG_ORDER = list(LANG_MARKERS)


def normalized(col: Column) -> Column:
    """lower + collapse whitespace + trim (canonical form for
    fingerprints and dedup)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def normalized_sql(expr: str) -> str:
    return f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"


def fingerprint_md5(col: Column) -> Column:
    """Content fingerprint of the normalized text."""
    return F.md5(normalized(col))


def fingerprint_md5_sql(expr: str) -> str:
    return f"md5({normalized_sql(expr)})"


def word_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(WORD_RE)).cast("long")


def word_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '\\S+'))::BIGINT"


def bpe_token_count(col: Column) -> Column:
    """Sub-word token count over the lowercased text (letter runs /
    digit runs / single marks)."""
    return F.regexp_count(F.lower(col), F.lit(BPE_TOKEN_RE)).cast("long")


def bpe_token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all(lower({expr}), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))::BIGINT"


def char_shingles_of_normalized(t: Column, k: int = 3) -> Column:
    """Shingles of an ALREADY-normalized column. Pass a plain attribute
    (materialized behind a barrier) — passing a computed expression here
    re-evaluates it once per array element inside the HOF lambda."""
    idx = F.sequence(F.lit(1), F.length(t) - (k - 1))
    shingles = F.array_distinct(F.transform(idx, lambda i: F.substring(t, i, k)))
    return F.when(F.length(t) >= k, shingles).otherwise(F.array().cast("array<string>"))


def char_shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-character shingles of the normalized text (JVM-side:
    sequence + transform + array_distinct; no UDF).

    Guard for len < k: Spark's ``sequence(1, 0)`` yields a DESCENDING
    [1, 0] rather than the empty list DuckDB's generate_series gives —
    short texts must produce an explicitly empty array."""
    s = normalized(col)
    idx = F.sequence(F.lit(1), F.length(s) - (k - 1))
    shingles = F.array_distinct(F.transform(idx, lambda i: F.substring(s, i, k)))
    return F.when(F.length(s) >= k, shingles).otherwise(
        F.array().cast("array<string>")
    )


def char_shingles_sql(expr: str, k: int = 3) -> str:
    s = normalized_sql(expr)
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(len({s})-{k-1}, 0)),"
        f" i -> substr({s}, CAST(i AS INT), {k})))"
    )


def occurrences(col: Column, marker: str) -> Column:
    """Number of occurrences of ``marker`` (replace-and-measure — exact
    same formula as the SQL twin)."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(marker))))
        / F.lit(len(marker))
    ).cast("long")


def occurrences_sql(expr: str, marker: str) -> str:
    m = marker.replace("'", "''")
    padded = f"(' ' || lower({expr}) || ' ')"
    return f"CAST((len({padded}) - len(replace({padded}, '{m}', ''))) / {len(marker)} AS BIGINT)"


def lang_scores(col: Column) -> dict[str, Column]:
    return {
        lang: sum(occurrences(col, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }


def lang_scores_sql(expr: str) -> dict[str, str]:
    return {
        lang: " + ".join(occurrences_sql(expr, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """argmax language with fixed tie-break order (CASE chain — the SQL
    twin is the same chain, so results match bit-for-bit)."""
    scores = lang_scores(col)
    expr = None
    # build reversed so the first lang in LANG_ORDER wins ties
    for lang in reversed(LANG_ORDER):
        cond = scores[lang]
        others = [scores[o] for o in LANG_ORDER if o != lang]
        is_max = None
        for o in others:
            c = cond >= o
            is_max = c if is_max is None else (is_max & c)
        expr = F.when(is_max, F.lit(lang)) if expr is None else F.when(is_max, F.lit(lang)).otherwise(expr)
    return expr


def lang_id_sql(expr: str) -> str:
    scores = lang_scores_sql(expr)
    cases = []
    for lang in LANG_ORDER[:-1]:
        conds = " AND ".join(
            f"({scores[lang]}) >= ({scores[o]})" for o in LANG_ORDER if o != lang
        )
        cases.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(cases) + f" ELSE '{LANG_ORDER[-1]}' END"


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic from length / word shape /
    punctuation (rational arithmetic only)."""
    n_chars = F.length(col).cast("double")
    words = word_count(col).cast("double")
    punct = F.regexp_count(col, F.lit(r"[^a-zA-Z0-9\s]")).cast("double")
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    word_score = F.least(words / F.lit(100.0), F.lit(1.0))
    punct_penalty = F.least(punct / F.greatest(n_chars, F.lit(1.0)) * 5.0, F.lit(1.0))
    return F.round((len_score + word_score) / 2.0 * (1.0 - punct_penalty), 6)


def quality_score_sql(expr: str) -> str:
    n = f"CAST(len({expr}) AS DOUBLE)"
    w = f"CAST(len(regexp_extract_all({expr}, '\\S+')) AS DOUBLE)"
    p = f"CAST(len(regexp_extract_all({expr}, '[^a-zA-Z0-9\\s]')) AS DOUBLE)"
    return (
        f"round((least({n}/500.0, 1.0) + least({w}/100.0, 1.0)) / 2.0 "
        f"* (1.0 - least({p}/greatest({n},1.0)*5.0, 1.0)), 6)"
    )
