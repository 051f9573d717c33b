"""Semantic tests for the round-9 operators: repetition quality
signals, blocked fuzzy join, debounce, seasonality, schema evolution,
corrupt-record quarantine, retention sweep. The oracle harness checks
engine-vs-engine equality; these pin the SEMANTICS (bounds,
invariants, hand-computed fixtures)."""

from __future__ import annotations

from pyspark.sql import functions as F

from df_spark.queries.dedup import fuzzy_name_join
from df_spark.queries.events import events_debounce, seasonality_profile
from df_spark.queries.governance import retention_sweep
from df_spark.queries.sources_q import (
    jsonl_corrupt_quarantine,
    parquet_schema_evolution,
)
from df_spark.queries.text import ngram_repetition
from df_spark.sources.tables import load_sdf


def test_ngram_repetition_bounds_and_fixture(spark, sf_dir):
    rows = ngram_repetition(spark, sf_dir).collect()
    docs = {r.doc_id: r.text for r in
            load_sdf(spark, sf_dir, "documents").collect()}
    assert len(rows) == len(docs)
    for r in rows:
        assert 0 < r.uniq_word_permille <= 1000
        assert 0 < r.top_bigram_permille <= 1000
        assert 0 <= r.dup_fourgram_permille < 1000
    # hand-check one doc
    r0 = next(r for r in rows if r.doc_id == 0)
    w = docs[0].split(" ")
    assert r0.n_words == len(w)
    assert r0.uniq_word_permille == 1000 * len(set(w)) // len(w)
    bigs = [f"{a} {b}" for a, b in zip(w, w[1:])]
    top = max(bigs.count(x) for x in set(bigs))
    assert r0.top_bigram_permille == 1000 * top // len(bigs)
    fours = [" ".join(w[i:i + 4]) for i in range(len(w) - 3)]
    dup = len(fours) - len(set(fours))
    assert r0.dup_fourgram_permille == 1000 * dup // len(fours)


def test_fuzzy_name_join_is_exact_within_blocks(spark, sf_dir):
    """Every emitted pair really is within edit distance 2, ordered,
    and no BLOCK-SHARING qualifying pair is missed (blocking on the
    last token is the documented recall contract)."""
    import itertools

    rows = fuzzy_name_join(spark, sf_dir).collect()
    names = [r.nm for r in
             load_sdf(spark, sf_dir, "part")
             .select(F.col("p_name").alias("nm")).distinct().collect()]

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    got = {(r.name_a, r.name_b) for r in rows}
    for r in rows:
        assert r.name_a < r.name_b and r.dist == lev(r.name_a, r.name_b) <= 2
    expect = {
        (a, b) if a < b else (b, a)
        for a, b in itertools.combinations(names, 2)
        if a.rsplit(" ", 1)[-1] == b.rsplit(" ", 1)[-1] and lev(a, b) <= 2
    }
    assert got == expect


def test_events_debounce_totals(spark, sf_dir):
    out = {r.event_type: r for r in events_debounce(spark, sf_dir).collect()}
    counts = {r.event_type: r["count"] for r in
              load_sdf(spark, sf_dir, "events")
              .groupBy("event_type").count().collect()}
    for t, n in counts.items():
        assert out[t].n_kept + out[t].n_dropped == n
        assert out[t].n_kept >= 1  # first event per (user, type) always kept


def test_seasonality_profile_partition(spark, sf_dir):
    rows = seasonality_profile(spark, sf_dir).collect()
    assert all(1 <= r.dow <= 7 and 0 <= r.hod <= 23 for r in rows)
    total = load_sdf(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == total  # exact partition


def test_parquet_schema_evolution_nulls_are_v1(spark, sf_dir):
    rows = {r.o_orderstatus: r for r in
            parquet_schema_evolution(spark, sf_dir).collect()}
    orders = load_sdf(spark, sf_dir, "orders")
    n_even = orders.filter(F.col("o_orderkey") % 2 == 0).count()
    assert rows[None].n_orders == n_even  # all v1 rows surface as NULL
    assert sum(r.n_orders for r in rows.values()) == orders.count()


def test_jsonl_corrupt_quarantine_rule(spark, sf_dir):
    r = jsonl_corrupt_quarantine(spark, sf_dir).collect()[0]
    orders = load_sdf(spark, sf_dir, "orders")
    n_corrupt = orders.filter(F.col("o_orderkey") % 13 == 0).count()
    assert r.n_corrupt == n_corrupt
    assert r.n_valid == orders.count() - n_corrupt
    exact = (orders.filter(F.col("o_orderkey") % 13 != 0)
             .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
             .collect()[0][0])
    assert abs(r.valid_total - float(exact)) < 1e-6


def test_retention_sweep_cutoffs(spark, sf_dir):
    out = {r.event_type: r for r in retention_sweep(spark, sf_dir).collect()}
    ev = load_sdf(spark, sf_dir, "events")
    mt = ev.agg(F.max("ts")).collect()[0][0]
    for t, days in (("click", 7), ("view", 3), ("purchase", 30)):
        cut = mt.timestamp() * 1e6 - days * 86400 * 1e6
        assert out[t].oldest_kept_us >= cut - 1  # nothing older survives
        n = ev.filter(F.col("event_type") == t).count()
        assert out[t].n_kept + out[t].n_expired == n


def test_grouped_median_filter_is_exact_lower_median(spark, sf_dir):
    from df_spark.queries.analytics import grouped_median_filter

    out = {r.lang: r for r in grouped_median_filter(spark, sf_dir).collect()}
    docs = load_sdf(spark, sf_dir, "documents").collect()
    by_lang: dict[str, list] = {}
    for d in docs:
        by_lang.setdefault(d.lang, []).append((d.n_chars, d.doc_id))
    for lang, vals in by_lang.items():
        vals.sort()
        med = vals[(len(vals) + 1) // 2 - 1][0]  # rank-based lower median
        r = out[lang]
        assert r.med_chars == med
        assert r.n_above == sum(1 for c, _ in vals if c > med)
        assert r.n_above + r.n_at_or_below == len(vals)


def test_bucket_layout_memo_invalidates_on_data_change(spark, tmp_path):
    """The bucketed layout must rebuild when the SOURCE DATA changes:
    the memo key carries (size, mtime_ns) of both inputs, so a stale
    layout over refreshed data — the silent-wrong-results failure mode
    of cached physical layouts — cannot be served."""
    import os
    import shutil

    from df_spark.queries.sources_q import _BUCKET_LAYOUTS, bucketed_join

    src = "/root/testdata/sf0.001"
    d = tmp_path / "sfcopy"
    d.mkdir()
    for t in ("orders", "lineitem"):
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    sf_dir = str(d)

    before = dict(_BUCKET_LAYOUTS)
    r1 = {tuple(r) for r in bucketed_join(spark, sf_dir).collect()}
    keys1 = set(_BUCKET_LAYOUTS) - set(before)
    assert len(keys1) == 1  # first run wrote and memoized the layout

    # same data -> same key -> no new memo entry
    r2 = {tuple(r) for r in bucketed_join(spark, sf_dir).collect()}
    assert r2 == r1
    assert set(_BUCKET_LAYOUTS) - set(before) == keys1

    # refresh the data (mtime bump is what a rewritten file shows)
    os.utime(d / "orders.parquet")
    r3 = {tuple(r) for r in bucketed_join(spark, sf_dir).collect()}
    assert r3 == r1  # same content, rebuilt layout
    keys2 = set(_BUCKET_LAYOUTS) - set(before)
    # rebuild evicted the stale fingerprint: exactly ONE key may vouch
    # for the layout at any time (else reverting the source to the
    # older bytes would silently serve the newer layout)
    assert len(keys2) == 1 and keys2 != keys1


def test_bucket_layout_memo_rejects_reverted_source(spark, tmp_path):
    """The r9 ADVICE hole: change the source data (layout rebuilt
    under key B), then RESTORE the original bytes with preserved mtime
    (a snapshot/`cp -p` restore reproduces fingerprint key A exactly).
    Before the eviction fix, key A still vouched for the tables, so
    the query silently served the layout built from the CHANGED data
    — wrong results, no error. With at-most-one-vouching-key, the
    revert forces a rebuild and results match the original."""
    import os
    import shutil

    from df_spark.queries.sources_q import bucketed_join

    d = tmp_path / "sfrev"
    d.mkdir()
    shutil.copy("/root/testdata/sf0.001/lineitem.parquet",
                d / "lineitem.parquet")
    dst = d / "orders.parquet"
    shutil.copy("/root/testdata/sf0.001/orders.parquet", dst)
    st = os.stat(dst)
    state_a = (dst.read_bytes(), (st.st_atime_ns, st.st_mtime_ns))
    sf_dir = str(d)

    r_a = {tuple(x) for x in bucketed_join(spark, sf_dir).collect()}

    # state B: different valid orders data (bigger SF) -> rebuild
    shutil.copy("/root/testdata/sf0.01/orders.parquet", dst)
    r_b = {tuple(x) for x in bucketed_join(spark, sf_dir).collect()}
    assert r_b != r_a  # the changed data genuinely changes results

    # restore state A bytes AND mtime -> fingerprint key A reproduced
    dst.write_bytes(state_a[0])
    os.utime(dst, ns=state_a[1])
    r_rev = {tuple(x) for x in bucketed_join(spark, sf_dir).collect()}
    assert r_rev == r_a  # bug would return r_b here


def test_jpeg_fill_bytes_before_marker_parse():
    """JPEG allows 0xFF fill bytes before a marker; the segment walk
    must skip them rather than mis-reading a length."""
    from df_spark import multimodal as M
    from tests.test_multimodal import _jpeg_bytes

    base = _jpeg_bytes(20, 10)
    # inject fill bytes after SOI, before the APP0 marker
    padded = base[:2] + b"\xff\xff\xff" + base[2:]
    # the walker sees 0xFF fill -> skips; the following bytes are
    # \xff\xe0 (APP0) so the parse proceeds normally
    f = M._decode_jpeg(padded)
    assert f[:2] == [20.0, 10.0]


def test_stream_no_data_batch_knob_restores_conf(spark, sf_dir):
    """run_stream_to_memory(no_data_batch=False) must restore the
    session conf after the drain — a leaked 'false' would silently
    break every later append-mode aggregate in the session (closed
    windows would never be emitted)."""
    from df_spark.streaming import windows as SW

    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    before = spark.conf.get(key)
    stream = SW.read_events_stream(spark, sf_dir)
    SW.run_stream_to_memory(
        SW.dedup_stream(stream, keys=["event_id"], watermark="2 hours"),
        output_mode="append", state_partitions=2, no_data_batch=False,
    )
    assert spark.conf.get(key) == before
