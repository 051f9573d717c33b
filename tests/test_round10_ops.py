"""Semantic tests for the round-10 operators (beyond the smoke run
and the DuckDB oracle): each pins a property a silent bug would break
without changing row counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from df_spark.queries import load_registry
from df_spark.sources.tables import load_sdf

REG = load_registry()


def test_boilerplate_segments_counts_and_bounds(spark, sf_dir):
    out = {r.doc_id: r for r in REG["boilerplate_segments"].fn(spark, sf_dir).collect()}
    docs = load_sdf(spark, sf_dir, "documents").collect()
    import collections
    seg_docs = collections.defaultdict(set)
    per_doc = {}
    for d in docs:
        w = d.text.split(" ")
        segs = [" ".join(w[i:i + 2]) for i in range(len(w) - 1)]
        per_doc[d.doc_id] = (d.source, segs)
        for s in segs:
            seg_docs[(d.source, s)].add(d.doc_id)
    for doc_id, (source, segs) in per_doc.items():
        if not segs:
            assert doc_id not in out
            continue
        r = out[doc_id]
        assert r.n_segs == len(segs)
        n_boiler = sum(1 for s in segs if len(seg_docs[(source, s)]) >= 3)
        assert r.n_boiler_segs == n_boiler
        assert r.boiler_permille == (1000 * n_boiler) // len(segs)


def test_rtbf_cascade_conserves_counts(spark, sf_dir):
    out = REG["rtbf_cascade"].fn(spark, sf_dir).collect()
    cust = load_sdf(spark, sf_dir, "customer")
    orders = load_sdf(spark, sf_dir, "orders")
    li = load_sdf(spark, sf_dir, "lineitem")
    forget = cust.filter(F.col("c_custkey") % 97 == 0)
    assert sum(r.n_customers for r in out) == forget.count()
    fo = orders.join(forget, orders.o_custkey == forget.c_custkey)
    assert sum(r.n_orders for r in out) == fo.count()
    assert sum(r.n_lineitems for r in out) == li.join(
        fo.select("o_orderkey"), li.l_orderkey == fo.o_orderkey).count()
    # segments with forgotten customers but zero orders report zeros,
    # not missing rows
    assert {r.c_mktsegment for r in out} == {
        r.c_mktsegment for r in forget.select("c_mktsegment").distinct().collect()}


def test_join_skew_report_global_stats(spark, sf_dir):
    out = REG["join_skew_report"].fn(spark, sf_dir).collect()
    assert len(out) == 10
    ev = load_sdf(spark, sf_dir, "events")
    counts = {r.user_id: r.cnt for r in
              ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    total, n_keys, mx = sum(counts.values()), len(counts), max(counts.values())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.user_id, r.cnt) for r in out] == top
    for r in out:
        assert r.total_rows == total and r.n_keys == n_keys
        assert r.skew_ratio_permille == (1000 * mx * n_keys) // total
        assert r.share_permille == (1000 * r.cnt) // total


def test_grouping_sets_rollup_consistency(spark, sf_dir):
    rows = REG["grouping_sets_agg"].fn(spark, sf_dir).collect()
    detail = [r for r in rows if r.gid == 0]
    by_flag = [r for r in rows if r.gid == 1]
    grand = [r for r in rows if r.gid == 3]
    assert len(grand) == 1 and grand[0].l_returnflag is None
    assert grand[0].n_items == sum(r.n_items for r in detail)
    for fr in by_flag:
        assert fr.l_linestatus is None
        assert fr.n_items == sum(
            r.n_items for r in detail if r.l_returnflag == fr.l_returnflag)
        assert fr.revenue == pytest.approx(sum(
            r.revenue for r in detail if r.l_returnflag == fr.l_returnflag),
            abs=1e-6)


def test_wav_energy_windows_roundtrip(spark, sf_dir):
    out = REG["wav_energy_windows"].fn(spark, sf_dir).collect()
    docs = {d.doc_id: d.text for d in
            load_sdf(spark, sf_dir, "documents").collect()}
    got = {}
    for r in out:
        assert r.rate_hz == 8000  # parsed from the WAV header
        got.setdefault(r.media_id, {})[r.win_idx] = r.energy
    for doc_id, text in docs.items():
        b = text.encode("utf-8")
        nw = len(b) // 100
        if nw == 0:
            assert doc_id not in got
            continue
        assert set(got[doc_id]) == set(range(nw))  # full windows only
        for k in range(nw):
            want = sum((x - 64) * (x - 64) for x in b[k * 100:(k + 1) * 100])
            assert got[doc_id][k] == want


def test_wav_encode_decode_is_a_real_container():
    from df_spark.multimodal import _decode_wav, _encode_wav
    payload = _encode_wav([0, 100, -100, 32000, -32000], rate=16000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    feats = _decode_wav(payload)
    assert feats[0] == 1.0 and feats[1] == 16000.0 and feats[2] == 5.0


def test_stream_left_outer_partitions_clicks(spark, sf_dir):
    out = REG["stream_left_outer"].fn(spark, sf_dir).collect()
    matched = {r.click_id for r in out if r.purchase_id is not None}
    nulls = {r.click_id for r in out if r.purchase_id is None}
    assert not (matched & nulls)  # a matched click never gets a null row
    # matched set equals the batch inner interval join's click set
    ev = load_sdf(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("cid"),
        F.col("ts").alias("cts"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"))
    inner = c.join(p, (F.col("cu") == F.col("pu"))
                   & (F.col("pts") >= F.col("cts"))
                   & (F.col("pts") <= F.col("cts")
                      + F.expr("INTERVAL 30 minutes")))
    assert matched == {r.cid for r in inner.select("cid").distinct().collect()}
    # every null row is genuinely unmatched in batch
    assert not (nulls & matched)


def test_stream_quota_alerts_thresholds(spark, sf_dir):
    out = REG["stream_quota_alerts"].fn(spark, sf_dir).collect()
    for r in out:
        assert r.n_events >= 7
    # no duplicate alert per (window, user): fires exactly once
    keys = [(r.window_start, r.user_id) for r in out]
    assert len(keys) == len(set(keys))


def test_stream_timeout_sessions_vs_batch(spark, sf_dir):
    """The custom EventTimeTimeout sessionizer must agree with the
    batch gaps-and-islands computation under its emission contract:
    all non-final sessions, plus timed-out finals."""
    import collections

    out = {(r.user_id, r.start_us, r.end_us, r.n_events)
           for r in REG["stream_timeout_sessions"].fn(spark, sf_dir).collect()}
    ev = load_sdf(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")).collect()
    gap = 30 * 60 * 1_000_000
    byu = collections.defaultdict(list)
    for r in ev:
        byu[r.user_id].append(r.us)
    wm_ms = (max(r.us for r in ev) // 1000) - 2 * 3600 * 1000
    want = set()
    for u, ts in byu.items():
        ts.sort()
        start = last = ts[0]
        n = 1
        for t in ts[1:]:
            if t - last >= gap:
                want.add((u, start, last + gap, n))
                start = last = t
                n = 1
            else:
                last, n = t, n + 1
        if (last + gap) // 1000 <= wm_ms:  # timed-out final session
            want.add((u, start, last + gap, n))
    assert out == want


def test_dataset_manifest_detects_mutation(spark, tmp_path):
    """The content checksum must be row-order-free but mutation-
    sensitive: same bytes shuffled -> same sum; one changed value ->
    different sum."""
    import shutil

    from df_spark.queries.governance import _MANIFEST_TABLES

    src = "/root/testdata/sf0.001"
    d = tmp_path / "mani"
    d.mkdir()
    for t, _, _ in _MANIFEST_TABLES:
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    base = {r.table_name: r for r in
            REG["dataset_manifest"].fn(spark, str(d)).collect()}
    for t in base.values():
        if t.table_name == "lineitem":
            # the synthetic generator does NOT enforce the TPC-H
            # (orderkey, linenumber) PK — the manifest's job is to
            # REPORT that, and the report must match a direct count
            li = spark.read.parquet(f"{d}/lineitem.parquet")
            direct = li.select("l_orderkey", "l_linenumber").distinct().count()
            assert t.pk_distinct == direct < t.n_rows
        else:
            assert t.pk_distinct == t.n_rows  # dims have clean PKs
    # materialize region's rows, then rewrite (a lazy self-overwrite
    # would read its own half-deleted output)
    reg = spark.read.parquet(f"{d}/region.parquet")
    schema, rows = reg.schema, reg.collect()
    # shuffled row order -> identical manifest row (order-free sum)
    spark.createDataFrame(list(reversed(rows)), schema) \
        .coalesce(1).write.mode("overwrite").parquet(f"{d}/region.parquet")
    again = {r.table_name: r for r in
             REG["dataset_manifest"].fn(spark, str(d)).collect()}
    assert again["region"] == base["region"]
    # mutate one value -> content_sum changes, n_rows does not
    mut = [r.asDict() for r in rows]
    mut[0]["r_name"] = mut[0]["r_name"] + "X"
    spark.createDataFrame(mut, schema) \
        .coalesce(1).write.mode("overwrite").parquet(f"{d}/region.parquet")
    mutated = {r.table_name: r for r in
               REG["dataset_manifest"].fn(spark, str(d)).collect()}
    assert mutated["region"].n_rows == base["region"].n_rows
    assert mutated["region"].content_sum != base["region"].content_sum


def test_stream_sliding_each_event_in_four_windows(spark, sf_dir):
    out = REG["stream_sliding_hourly"].fn(spark, sf_dir).collect()
    ev = load_sdf(spark, sf_dir, "events")
    # total count across emitted windows == 4x events inside the fully
    # closed region (every event belongs to exactly 4 sliding windows;
    # events near the end have some of their windows withheld, so
    # compare on the region where all 4 windows closed)
    import datetime
    mx = ev.agg(F.max("ts")).collect()[0][0]
    wm = mx.replace(microsecond=(mx.microsecond // 1000) * 1000) \
        - datetime.timedelta(hours=2)
    # an event's LAST window is [bucket(t), +1h); all 4 closed iff
    # bucket15(t) + 1h <= wm
    def bucket15(t):
        return t.replace(minute=(t.minute // 15) * 15, second=0,
                         microsecond=0)
    all_closed = [r for r in ev.select("ts").collect()
                  if bucket15(r.ts) + datetime.timedelta(hours=1) <= wm]
    emitted_total = sum(r.n_events for r in out)
    # every fully-closed event contributes exactly 4; partially-closed
    # events contribute 1-3, so the total is bounded by these
    lo = 4 * len(all_closed)
    assert emitted_total >= lo
    assert emitted_total <= lo + 3 * (ev.count() - len(all_closed))


# ---- second batch of round-10 operators -------------------------------


def test_chunk_dedup_first_occurrence_election(spark, sf_dir):
    import hashlib

    out = {r.doc_id: r for r in REG["chunk_dedup"].fn(spark, sf_dir).collect()}
    docs = sorted(load_sdf(spark, sf_dir, "documents").collect(),
                  key=lambda d: d.doc_id)
    seen = set()
    expected = {}
    for d in docs:  # doc_id order == election order
        text = d.text or ""
        chunks = [text[i:i + 120] for i in range(0, max(len(text), 1), 120)]
        kept = []
        n_kept = 0
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept.append(c)
                n_kept += 1
            else:
                kept.append("")
        expected[d.doc_id] = (len(chunks), n_kept,
                              hashlib.md5("".join(kept).encode()).hexdigest())
    for doc_id, (n_chunks, n_kept, md5) in expected.items():
        r = out[doc_id]
        assert r.n_chunks == n_chunks
        assert r.kept_chunks == n_kept
        assert r.retained_md5 == md5
    # corpus-level invariant: every distinct chunk is kept exactly once
    total_kept = sum(r.kept_chunks for r in out.values())
    assert total_kept == len(seen)


def test_char_diversity_matches_counter(spark, sf_dir):
    from collections import Counter

    out = {r.doc_id: r for r in REG["char_diversity"].fn(spark, sf_dir).collect()}
    for d in load_sdf(spark, sf_dir, "documents").collect():
        if not d.text:
            assert d.doc_id not in out
            continue
        c = Counter(d.text)
        n = sum(c.values())
        r = out[d.doc_id]
        assert r.n_chars == n
        assert r.distinct_chars == len(c)
        assert r.simpson_ppm == (1000000 * sum(v * v for v in c.values())) // (n * n)
        assert r.top_char_permille == (1000 * max(c.values())) // n


def test_hard_negatives_labels_and_order(spark, sf_dir):
    import numpy as np

    out = REG["hard_negatives"].fn(spark, sf_dir).collect()
    emb = {r.vec_id: (np.array(r.embedding, dtype="float64"), r.label)
           for r in load_sdf(spark, sf_dir, "embeddings").collect()}
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        qv, qlabel = emb[qid]
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        for r in rows:
            assert emb[r.vec_id][1] != qlabel  # negatives only
        # rank-1 really is the max-cosine different-label vector
        def cos(a, b):
            return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        best = max(
            ((vid, cos(qv, v)) for vid, (v, lb) in emb.items() if lb != qlabel),
            key=lambda t: (t[1], -t[0]),
        )
        assert rows[0].vec_id == best[0]


def test_merge_apply_clause_gating(spark):
    from df_spark.operators.cdc import merge_apply

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    changes = spark.createDataFrame(
        [
            (2, "B", "U"),    # matched update
            (3, None, "D"),   # matched delete
            (4, "d", "I"),    # unmatched insert
            (5, "x", "U"),    # U without match -> dropped
            (1, "dup", "I"),  # I with match -> dropped
            (6, "y", "Z"),    # unknown op -> dropped
        ],
        ["k", "v", "op"],
    )
    out = {r.k: r.v for r in merge_apply(target, changes, keys=["k"]).collect()}
    assert out == {1: "a", 2: "B", 4: "d"}


def test_merge_upsert_key_algebra(spark, sf_dir):
    out = REG["merge_upsert"].fn(spark, sf_dir)
    orders = load_sdf(spark, sf_dir, "orders")
    n = orders.count()
    n_del = orders.filter(F.col("o_orderkey") % 13 == 0).count()
    n_ins = orders.filter(F.col("o_orderkey") % 17 == 0).count()
    assert out.count() == n - n_del + n_ins
    keys = [r.o_orderkey for r in out.select("o_orderkey").collect()]
    assert len(keys) == len(set(keys))  # still a snapshot (unique keys)
    # every update row carries the new tag; untouched rows never do
    tagged = out.filter(F.col("o_orderpriority") == "0-MERGED")
    k = F.col("o_orderkey")
    assert tagged.filter((k % 13 == 0) | (k % 7 != 0)).count() == 0


def test_minhash_est_audit_partitions_sample(spark, sf_dir):
    from df_spark.operators import dedup as D

    docs = load_sdf(spark, sf_dir, "documents")
    pairs = D.lsh_candidate_pairs(D.minhash_signatures(docs))
    n_sampled = pairs.filter(
        (F.col("id_a") * 31 + F.col("id_b")) % 20 == 0).count()
    out = REG["minhash_est_audit"].fn(spark, sf_dir).collect()
    assert sum(r.n_pairs for r in out) == n_sampled
    for r in out:
        lo, hi = r.err_bucket * 50, r.err_bucket * 50 + 49
        assert lo <= r.min_err_permille <= r.max_err_permille <= hi


def test_stream_topk_trending_matches_batch(spark, sf_dir):
    out = REG["stream_topk_trending"].fn(spark, sf_dir)
    ev = load_sdf(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    agg = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events")).select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "user_id", "n_events",
    )
    rk = W.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("user_id").asc())
    batch = agg.withColumn("rank", F.row_number().over(rk)).filter(
        F.col("rank") <= 3)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_vocab_oov_rate_against_counter(spark, sf_dir):
    from collections import Counter

    out = {r.doc_id: r for r in REG["vocab_oov_rate"].fn(spark, sf_dir).collect()}
    from df_spark.functions.text import normalized
    docs = load_sdf(spark, sf_dir, "documents").select(
        "doc_id", normalized(F.col("text")).alias("t")).collect()
    freq = Counter()
    per_doc = {}
    for d in docs:
        toks = [t for t in d.t.split(" ") if t]
        per_doc[d.doc_id] = toks
        freq.update(toks)
    vocab = {t for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:50]}
    for doc_id, toks in per_doc.items():
        if not toks:
            assert doc_id not in out
            continue
        r = out[doc_id]
        n_oov = sum(1 for t in toks if t not in vocab)
        assert r.n_tokens == len(toks)
        assert r.n_oov == n_oov
        assert r.oov_permille == (1000 * n_oov) // len(toks)


def test_jsonl_gzip_files_and_counts(spark, sf_dir):
    import glob
    out = REG["jsonl_gzip_roundtrip"].fn(spark, sf_dir)
    total = sum(r.n_events for r in out.collect())
    ev = load_sdf(spark, sf_dir, "events")
    assert total == ev.count()
    # the sink really wrote gzip members (non-splittable -> file count
    # IS the read parallelism; the repartition(8) pins it)
    from df_spark.queries.sources_q import _scratch
    files = glob.glob(_scratch("df_spark_jsonl_gz_roundtrip", sf_dir) + "/*.json.gz")
    assert len(files) == 8


def test_mad_outliers_robust_twin(spark, sf_dir):
    import statistics

    out = {r.event_type: r for r in REG["mad_outliers"].fn(spark, sf_dir).collect()}
    rows = load_sdf(spark, sf_dir, "events").select(
        "event_type", "event_id", "value").collect()
    import collections
    byt = collections.defaultdict(list)
    # half-away-from-zero, matching both engines' round(x, 2) — Python
    # round() is half-to-even and would disagree on exact .5 cents
    # (e.g. 0.125*100 = 12.5 exactly representable)
    import decimal
    def cents(v):
        return int(decimal.Decimal(str(v * 100)).quantize(
            0, rounding=decimal.ROUND_HALF_UP))
    for r in rows:
        byt[r.event_type].append((cents(r.value), r.event_id))
    for t, vals in byt.items():
        ordered = sorted(vals)  # (cents, id) total order
        med = ordered[(len(ordered) + 1) // 2 - 1][0]
        devs = sorted((abs(c - med), i) for c, i in vals)
        mad = devs[(len(devs) + 1) // 2 - 1][0]
        r = out[t]
        assert r.median_cents == med and r.mad_cents == mad
        assert r.n_outliers == sum(1 for c, _ in vals if abs(c - med) > 3 * mad)
        assert r.n_events == len(vals)


def test_mix_temperature_flattens_shares(spark, sf_dir):
    out = {r.lang: r for r in REG["mix_temperature"].fn(spark, sf_dir).collect()}
    toks = {r.lang: r.toks for r in
            load_sdf(spark, sf_dir, "documents").groupBy("lang")
            .agg(F.sum("n_chars").alias("toks")).collect()}
    total = sum(toks.values())
    # alpha=0.5 must move every language's share toward uniform:
    # under-represented langs gain share, over-represented lose
    n_langs = len(toks)
    for lang, n in toks.items():
        raw_share = n / total
        temp_share = out[lang].share_permille / 1000
        if raw_share < 1 / n_langs:
            assert temp_share >= raw_share - 1e-3
        else:
            assert temp_share <= raw_share + 1e-3
    # quotas never exceed availability (no upsampling past the corpus)
    for lang, r in out.items():
        assert 0 <= r.quota_tokens
        assert abs(r.sample_rate - round(r.quota_tokens / r.available_tokens, 6)) < 1e-9
