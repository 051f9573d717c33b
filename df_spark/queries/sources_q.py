"""CSV source round-trip query — driver-visible correctness coverage
for the one SURVEY §2 source the parquet-only driver tables never
exercise (reference ``src/reader.rs:99-218``: '|'-delimited, headerless,
explicit schema, no inference).

The query exports ``supplier`` to the reference CSV format, reads it
back through ``Df.from_csv``, and aggregates; the oracle runs the same
aggregate on the original parquet. A value mismatch anywhere in the
write→parse→type-coercion path (delimiters, quoting, double formatting,
null encoding) surfaces as a hash mismatch.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..frame import Df
from ..sources.tables import load_sdf
from . import register

_SUPPLIER_SCHEMA = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)


@register(
    "csv_roundtrip",
    sql="""
    SELECT s_nationkey,
           COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
           MIN(s_name) AS first_name
    FROM supplier
    GROUP BY s_nationkey
    """,
)
def csv_roundtrip(spark, sf_dir):
    # one scratch dir per source sf_dir, overwritten on each run (the
    # write is part of the query under test, not a cached input)
    out = os.path.join(
        tempfile.gettempdir(),
        "df_spark_csv_roundtrip",
        hashlib.md5(sf_dir.encode()).hexdigest()[:12],
    )
    src = Df(load_sdf(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    ))
    src.write_csv(out)
    back = Df.from_csv(spark, out, _SUPPLIER_SCHEMA)
    return (
        back.to_spark()
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_acctbal"),
            F.min("s_name").alias("first_name"),
        )
    )


@register(
    "parquet_partitioned_sink",
    sql="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           SUM(n_chars) AS total_chars
    FROM documents
    WHERE lang IN ('en', 'de')
    GROUP BY 1, 2
    """,
)
def parquet_partitioned_sink(spark, sf_dir):
    """Partitioned parquet sink + pruned read-back — the write path the
    reference lacks entirely (SURVEY §2 checklist: 'No sinks'). Writes
    ``documents`` hive-partitioned by ``lang``, reads it back with a
    partition filter, and aggregates; the oracle runs the same
    aggregate on the original table, so any corruption in the
    write→layout→read→prune path is a hash mismatch.

    100 TB story: partitionBy on a low-cardinality column is the
    standard lake layout — the read-back filter becomes a
    PartitionFilters entry (directories never listed), not a data
    filter, which test_partition_pruned_readback pins in the plan.
    """
    out = os.path.join(
        tempfile.gettempdir(),
        "df_spark_part_sink",
        hashlib.md5(sf_dir.encode()).hexdigest()[:12],
    )
    docs = load_sdf(spark, sf_dir, "documents")
    (docs.write.mode("overwrite").partitionBy("lang").parquet(out))
    back = spark.read.parquet(out).filter(F.col("lang").isin("en", "de"))
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
