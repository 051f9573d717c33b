"""Null/empty-input semantics for the text/sampling/dedup operators.

The synthetic tables carry no NULLs, so the DuckDB oracle can never
catch a null-handling divergence — these tests pin the behavior
explicitly. Policy (documented here, asserted below): rows with NULL
text or NULL id are silently excluded from derived text artifacts
(shingles, fingerprints, samples, chunks produce no row), mirroring
SQL semantics where a NULL predicate/join key never matches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from df_spark.operators.dedup import (
    exact_dedup_stats,
    hashed_shingle_sets,
    shingle_hashes,
    winnow_selected,
)
from df_spark.operators.sampling import bernoulli_sample


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingle_hashes_drops_null_and_short_text(spark):
    docs = _docs(spark, [(1, None), (2, "ab"), (3, ""), (4, "abcd")])
    got = shingle_hashes(docs).groupBy("doc_id").count().collect()
    # only doc 4 (len >= k) produces shingle rows; NULL/short/empty drop
    assert {(r.doc_id, r["count"]) for r in got} == {(4, 2)}


def test_hashed_shingle_sets_empty_array_not_null(spark):
    docs = _docs(spark, [(1, "ab"), (2, "abcd")])
    rows = {r.doc_id: r.sh for r in hashed_shingle_sets(docs).collect()}
    assert rows[1] == []  # short text -> EMPTY set, never NULL
    assert len(rows[2]) == 2


def test_exact_dedup_null_texts_group_together(spark):
    # md5(NULL) is NULL; NULL fingerprints form their own group via
    # groupBy (Spark groups NULL keys) — both null docs land in one
    # group, a real dedup decision rather than a dropped row
    docs = _docs(spark, [(1, None), (2, None), (3, "x")])
    rows = {tuple(r) for r in
            exact_dedup_stats(docs).select("keep_id", "n_copies").collect()}
    assert (1, 2) in rows and (3, 1) in rows


def test_bernoulli_sample_null_id_excluded(spark):
    df = spark.createDataFrame(
        [(None,), (1,), (2,), (3,)], "doc_id long"
    )
    kept = bernoulli_sample(df, 1.0, "doc_id").collect()
    # rate 1.0 keeps every non-null id; the NULL id's hash draw is NULL
    # and a NULL comparison never passes a filter — excluded, not kept
    assert {r.doc_id for r in kept} == {1, 2, 3}


def test_winnow_short_text_produces_no_windows(spark):
    # text shorter than k + w - 1 has no full window -> no fingerprints
    docs = _docs(spark, [(1, "abcd"), (2, None), (3, "abcdefgh")])
    got = {r.doc_id for r in winnow_selected(docs, k=3, w=4).collect()}
    assert got == {3}


def test_contamination_null_text_on_either_side(spark):
    from df_spark.operators.dedup import contamination_scores

    bench = _docs(spark, [(9, None), (10, "abcdef")])
    train = _docs(spark, [(1, "abcdef"), (2, None)])
    got = {r.doc_id for r in contamination_scores(train, bench).collect()}
    assert got == {1}  # null docs contribute no shingles on either side
