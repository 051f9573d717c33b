"""Source/sink tests: CSV parity with the reference reader
(``'|'``-delimited, headerless, explicit schema — reference
``src/reader.rs:142-145``, test ``tests/lib.rs:370-394``), plus the
Parquet source/sink the reference lacks."""

from __future__ import annotations

from pyspark.sql import types as T

from df_spark import Df


CSV_SCHEMA = T.StructType([
    T.StructField("bool", T.BooleanType()),
    T.StructField("int", T.LongType()),
    T.StructField("float", T.DoubleType()),
    T.StructField("string", T.StringType()),
])


def test_read_csv(spark, tmp_path):
    p = tmp_path / "mixed.csv"
    p.write_text("true|1|1.0|hello world\nfalse|4|1.2|fOObAr\n")
    df = Df.from_csv(spark, str(p), CSV_SCHEMA)
    assert [tuple(r) for r in df.order_by("int").collect()] == [
        (True, 1, 1.0, "hello world"),
        (False, 4, 1.2, "fOObAr"),
    ]
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "boolean", "bigint", "double", "string"]


def test_csv_roundtrip(spark, tmp_path):
    src = tmp_path / "src.csv"
    src.write_text("true|1|1.5|abc\nfalse|2|2.5|def\n")
    df = Df.from_csv(spark, str(src), CSV_SCHEMA)
    out = tmp_path / "out_csv"
    df.write_csv(str(out))
    back = Df.from_csv(spark, str(out), CSV_SCHEMA)
    assert sorted(tuple(r) for r in back.collect()) == sorted(tuple(r) for r in df.collect())


def test_parquet_roundtrip(spark, tmp_path):
    df = Df.from_vecs(spark, [("k", [1, 2, 3]), ("s", ["a", "b", "c"])])
    out = tmp_path / "out_parquet"
    df.write_parquet(str(out))
    back = Df.from_parquet(spark, str(out))
    assert sorted(tuple(r) for r in back.collect()) == [(1, "a"), (2, "b"), (3, "c")]


def test_parquet_partitioned_sink(spark, tmp_path):
    df = Df.from_vecs(spark, [("k", [1, 1, 2]), ("s", ["a", "b", "c"])])
    out = tmp_path / "part_parquet"
    df.write_parquet(str(out), partition_by=["k"])
    back = Df.from_parquet(spark, str(out))
    assert back.count() == 3
    assert sorted(back.columns) == ["k", "s"]


def test_testdata_tables_load(spark, sf_dir):
    from df_spark.sources.tables import TABLES, load_table

    for table in TABLES:
        df = load_table(spark, sf_dir, table)
        assert df.count() > 0
    events = load_table(spark, sf_dir, "events")
    assert dict((f.name, f.dataType.simpleString()) for f in events.schema.fields)["ts"] == "timestamp"


JSONL_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("score", T.DoubleType()),
])


def test_jsonl_roundtrip_unit(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"id": 1, "text": "hello \\"quoted\\" world", "score": 0.5}\n'
        '{"id": 2, "text": null, "score": -1.25}\n'
        '{"id": 3, "text": "uni\\u00e7ode", "score": 3e10}\n'
    )
    df = Df.from_jsonl(spark, str(p), JSONL_SCHEMA)
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [
        (1, 'hello "quoted" world', 0.5),
        (2, None, -1.25),
        (3, "uniçode", 3e10),
    ]
    out = tmp_path / "out_jsonl"
    df.write_jsonl(str(out))
    back = Df.from_jsonl(spark, str(out), JSONL_SCHEMA)
    assert sorted(tuple(r) for r in back.collect()) == rows


def test_jsonl_missing_field_is_null(spark, tmp_path):
    # explicit schema: absent keys land as NULL, never a parse error —
    # the behavior heterogenous 100 TB corpora need
    p = tmp_path / "sparse.jsonl"
    p.write_text('{"id": 1}\n{"id": 2, "score": 1.0}\n')
    rows = sorted(tuple(r) for r in Df.from_jsonl(spark, str(p), JSONL_SCHEMA).collect())
    assert rows == [(1, None, None), (2, None, 1.0)]


def test_orc_roundtrip_unit(spark, tmp_path):
    df = Df.from_vecs(spark, [
        ("k", [1, 2, 3]),
        ("v", ["a", "b", None]),
    ])
    out = tmp_path / "out_orc"
    df.write_orc(str(out))
    back = Df.from_orc(spark, str(out))
    assert sorted(tuple(r) for r in back.collect()) == [(1, "a"), (2, "b"), (3, None)]


def test_compact_files_counts(spark, sf_dir):
    """The compaction query's small→compacted layout: 64 ingest files
    become exactly 4 (coalesce is a narrow rewrite — no shuffle)."""
    from pyspark.sql import functions as F

    from df_spark.queries import load_registry

    load_registry()["compact_files"].fn(spark, sf_dir).collect()
    import hashlib
    import os
    import tempfile
    base = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    small = os.path.join(tempfile.gettempdir(), "df_spark_compact_small", base)
    big = os.path.join(tempfile.gettempdir(), "df_spark_compact_big", base)
    n_small = (spark.read.parquet(small)
               .select(F.input_file_name().alias("f")).distinct().count())
    n_big = (spark.read.parquet(big)
             .select(F.input_file_name().alias("f")).distinct().count())
    assert n_small == 64
    assert n_big == 4


def test_orc_filter_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    df = Df.from_vecs(spark, [
        ("k", list(range(100))),
        ("v", [f"row{i}" for i in range(100)]),
    ])
    out = tmp_path / "orc_push"
    df.write_orc(str(out))
    back = Df.from_orc(spark, str(out)).to_spark().filter(F.col("k") > 90)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), GreaterThan(k,90)]" in plan
    assert back.count() == 9


def test_jsonl_malformed_line_permissive(spark, tmp_path):
    """PERMISSIVE mode (Spark's default): a corrupt line becomes a
    null-filled row instead of failing the 100 TB read job."""
    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"id": 1, "text": "good", "score": 1.0}\n'
        'this is not json at all\n'
        '{"id": 3, "text": "also good", "score": 3.0}\n'
    )
    rows = sorted(
        (tuple(r) for r in Df.from_jsonl(spark, str(p), JSONL_SCHEMA).collect()),
        key=str,
    )
    assert (1, "good", 1.0) in rows and (3, "also good", 3.0) in rows
    assert (None, None, None) in rows  # the corrupt line, not an exception
    assert len(rows) == 3


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution across ingest generations: an old shard without
    the new column and a new shard with it read together under
    mergeSchema — union schema, old rows NULL in the new column. The
    lake contract that lets a 100 TB corpus add fields without
    rewriting history."""
    from pyspark.sql import functions as F

    old_gen = Df.from_vecs(spark, [("id", [1, 2]), ("text", ["a", "b"])])
    new_gen = Df.from_vecs(spark, [
        ("id", [3]), ("text", ["c"]), ("quality", [0.9]),
    ])
    old_gen.write_parquet(str(tmp_path / "gen" / "g=0"))
    new_gen.write_parquet(str(tmp_path / "gen" / "g=1"))
    merged = (spark.read.option("mergeSchema", "true")
              .parquet(str(tmp_path / "gen")))
    assert set(merged.columns) == {"id", "text", "quality", "g"}
    rows = {r.id: (r.text, r.quality) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 0.9)}
    # and the new column still filters with pushdown on the merged scan
    plan = (merged.filter(F.col("quality") > 0.5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters" in plan and "GreaterThan(quality,0.5)" in plan


def test_partition_backfill_leaves_siblings_untouched(spark, sf_dir, tmp_path):
    """Dynamic partition overwrite must rewrite ONLY the target
    partition's files; sibling partitions keep their exact files."""
    import os

    from pyspark.sql import functions as F

    from df_spark.sources.tables import load_sdf

    out = str(tmp_path / "backfill")
    docs = load_sdf(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)

    def listing(lang):
        d = os.path.join(out, f"lang={lang}")
        return sorted(
            (f, os.path.getmtime(os.path.join(d, f)), os.path.getsize(os.path.join(d, f)))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    before_en, before_de = listing("en"), listing("de")
    (
        docs.filter(F.col("lang") == "de")
        .withColumn("n_chars", F.col("n_chars") + 1_000_000)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("lang")
        .parquet(out)
    )
    assert listing("en") == before_en  # sibling physically untouched
    assert listing("de") != before_de  # target rewritten
    # and the data reflects exactly the one corrected partition
    back = spark.read.parquet(out)
    assert back.filter(F.col("lang") == "de").agg(
        F.min("n_chars")
    ).collect()[0][0] >= 1_000_000
    n_docs = docs.count()
    assert back.count() == n_docs
