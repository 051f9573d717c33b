from __future__ import annotations

from pyspark.sql import functions as F

from df_spark.operators.dedup import contamination_scores
from df_spark.operators.sampling import bernoulli_sample, mix_sources, stratified_sample


def test_bernoulli_sample_deterministic_and_near_rate(spark):
    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    s1 = {r.doc_id for r in bernoulli_sample(df, 0.25, "doc_id").collect()}
    s2 = {r.doc_id for r in bernoulli_sample(df, 0.25, "doc_id").collect()}
    assert s1 == s2  # content-hash draw: identical row set every run
    assert 0.20 <= len(s1) / 4000 <= 0.30


def test_bernoulli_sample_monotone_in_rate(spark):
    # a row kept at rate r stays kept at any higher rate (hash draw is
    # compared against a growing threshold) — lets curators grow a
    # sample without resampling history
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    lo = {r.doc_id for r in bernoulli_sample(df, 0.1, "doc_id").collect()}
    hi = {r.doc_id for r in bernoulli_sample(df, 0.5, "doc_id").collect()}
    assert lo <= hi


def test_stratified_sample_rates_and_missing_stratum(spark):
    rows = [(i, ["en", "fr", "und"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "lang", {"en": 0.5, "fr": 0.1}, "doc_id")
    by_lang = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "und" not in by_lang  # stratum without a budget is dropped
    assert 0.40 <= by_lang["en"] / 1000 <= 0.60
    assert 0.05 <= by_lang["fr"] / 1000 <= 0.16


def test_contamination_scores_flags_overlap_only(spark):
    bench = spark.createDataFrame(
        [(1000, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox sat still"),  # heavy shingle overlap
            (2, "zzzz qqqq vvvv kkkk wwww"),       # disjoint content
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_shared for r in
           contamination_scores(train, bench, min_shared=5).collect()}
    assert 1 in out and out[1] >= 5
    assert 2 not in out


def test_contamination_min_shared_threshold(spark):
    bench = spark.createDataFrame([(9, "abcdefgh")], "doc_id long, text string")
    train = spark.createDataFrame([(1, "abcd")], "doc_id long, text string")
    # "abcd" shares exactly the shingles {abc, bcd} with the benchmark
    assert contamination_scores(train, bench, min_shared=3).count() == 0
    got = contamination_scores(train, bench, min_shared=2).collect()
    assert len(got) == 1 and got[0].n_shared == 2


def test_mix_sources_feasibility_and_drop(spark):
    rows = [(i, f"src{i % 4}") for i in range(4000)]  # 1000 per source
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # src3 absent from the target -> dropped; src0 is the binding
    # constraint (1000/0.5 = 2000 = min), so src0 keeps everything
    out = mix_sources(df, {"src0": 0.5, "src1": 0.3, "src2": 0.2}, "doc_id")
    by_src = {r.source: r.n for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "src3" not in by_src
    assert by_src["src0"] == 1000  # rate exactly 1.0 keeps all rows
    # others land near their target share of the feasible 2000
    assert 0.5 <= by_src["src1"] / 600 <= 1.5
    assert 0.5 <= by_src["src2"] / 400 <= 1.5
    # kept mix is reproducible
    again = {r.source: r.n for r in
             mix_sources(df, {"src0": 0.5, "src1": 0.3, "src2": 0.2}, "doc_id")
             .groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert again == by_src


def test_weighted_sample_rate_tracks_weight(spark):
    """Rows with weight w survive at ~w: construct 4000 rows at two
    fixed weights and check survival counts land near n*w (binomial-ish
    bounds are safe at 6 sigma for the deterministic uniform hash)."""
    from pyspark.sql import functions as F

    from df_spark.operators.sampling import weighted_sample

    rows = [(i, 0.9 if i % 2 == 0 else 0.1) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, w double")
    kept = weighted_sample(df, F.col("w"), "id").groupBy("w").count().collect()
    by_w = {round(r.w, 1): r["count"] for r in kept}
    assert abs(by_w[0.9] - 1800) < 120  # 2000 * 0.9
    assert abs(by_w[0.1] - 200) < 120   # 2000 * 0.1
    # weight 0 and 1 are exact boundaries: nothing / everything
    edge = spark.createDataFrame([(1, 0.0), (2, 1.0)], "id long, w double")
    got = {r.id for r in weighted_sample(edge, F.col("w"), "id").collect()}
    assert got == {2}
