"""Semantic invariants for the governance / lake round-5 additions
(PII redaction, MIME sniffing, snapshot time-travel diff, last-touch
attribution) — properties the DuckDB oracle's value-hash cannot
articulate on its own."""

from __future__ import annotations

from pyspark.sql import functions as F

from df_spark.queries import load_registry
from df_spark.sources.tables import load_sdf

REG = load_registry()


def test_pii_redact_is_complete_and_counts_injected(spark, sf_dir):
    rows = REG["pii_redact"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # injection plants exactly one email and one phone per doc, and
        # the corpus itself contains none — so the detector must count
        # exactly those, and the scrubbed text must have zero left
        assert r.n_emails == 1
        assert r.n_phones == 1
        assert r.is_clean


def test_mime_sniff_detects_injected_magic(spark, sf_dir):
    rows = REG["mime_sniff"].fn(spark, sf_dir).collect()
    assert rows
    expect = {0: "jpeg", 1: "png", 2: "riff", 3: "unknown"}
    for r in rows:
        assert r.detected == expect[r.media_id % 4]
        # magic-prefixed payloads carry their 4 header bytes
        assert r.n_bytes >= (4 if r.media_id % 4 != 3 else 0)


def test_snapshot_diff_partitions_the_keyspace(spark, sf_dir):
    out = {r.change_type: r for r in REG["snapshot_diff"].fn(spark, sf_dir).collect()}
    assert set(out) == {"added", "removed", "changed", "unchanged"}
    orders = load_sdf(spark, sf_dir, "orders")
    n = orders.count()
    n_v1 = orders.filter(F.col("o_orderkey") % 7 != 0).count()
    n_v2 = orders.filter(F.col("o_orderkey") % 5 != 0).count()
    # added + changed + unchanged = |v2|; removed + changed + unchanged = |v1|
    assert out["added"].n + out["changed"].n + out["unchanged"].n == n_v2
    assert out["removed"].n + out["changed"].n + out["unchanged"].n == n_v1
    # price bump only raises prices -> changed delta strictly positive;
    # removed rows only subtract -> strictly negative
    assert out["changed"].price_delta > 0
    assert out["removed"].price_delta < 0


def test_attribution_conserves_purchases(spark, sf_dir):
    out = REG["last_touch_attribution"].fn(spark, sf_dir).collect()
    channels = {r.channel for r in out}
    assert channels <= {"click", "view", "signup", "direct"}
    events = load_sdf(spark, sf_dir, "events")
    n_purchases = events.filter(F.col("event_type") == "purchase").count()
    assert sum(r.n_purchases for r in out) == n_purchases
    for r in out:
        assert r.attributed_value > 0


def test_retention_sweep_empty_events_yields_zero_rows(spark, tmp_path):
    """The cutoff anchor lives in-plan (broadcast 1-row max), so an
    empty events table returns an empty frame instead of failing on a
    None literal (r9 ADVICE)."""
    src = load_sdf(spark, "/root/testdata/sf0.001", "events")
    d = str(tmp_path / "empty_sf")
    src.limit(0).write.parquet(f"{d}/events.parquet")
    out = REG["retention_sweep"].fn(spark, d)
    assert out.collect() == []


def test_retention_sweep_plan_keeps_anchor_in_plan(spark, sf_dir):
    """No driver round-trip: the anchor max rides a broadcast exchange
    inside one executed plan."""
    plan = (REG["retention_sweep"].fn(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
