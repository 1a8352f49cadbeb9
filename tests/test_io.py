"""Multi-format source/sink layer (`sources/io.py`): roundtrips per
format, alias + heal composition on read, partitioned and bucketed
writes."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from joblink_etl_spark.sources.io import infer_once, read_table, write_table

SCHEMA = StructType(
    [
        StructField("link", StringType()),
        StructField("company", StringType()),
        StructField("n", IntegerType()),
    ]
)

ROWS = [
    ("https://a.example/j/1", "Acme", 1),
    ("https://b.example/j/2", "Globex", 2),
    ("https://c.example/j/3", 'Quote"Corp', 3),
]


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip_each_format(spark, tmp_path, fmt):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / fmt)
    write_table(df, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=SCHEMA)
    assert back.schema == SCHEMA
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)


def test_csv_alias_and_heal(spark, tmp_path):
    """A CSV export with renamed headers and a missing column comes
    back with canonical names, the blank column healed to ''."""
    path = str(tmp_path / "aliased")
    raw = spark.createDataFrame(
        [("https://a.example", 7)], ["Job URL", "n"]
    )
    write_table(raw, path, fmt="csv", header="true")
    got = read_table(
        spark,
        path,
        fmt="csv",
        schema=StructType(
            [StructField("Job URL", StringType()), StructField("n", IntegerType())]
        ),
        rename_map={"link": "Job URL"},
        heal_to=SCHEMA,
    )
    assert got.columns == ["link", "company", "n"]
    row = got.collect()[0]
    assert row.link == "https://a.example" and row.company == "" and row.n == 7


def test_infer_once_then_single_pass_read(spark, tmp_path):
    path = str(tmp_path / "inferme")
    write_table(spark.createDataFrame(ROWS, SCHEMA), path, fmt="csv")
    schema = infer_once(spark, path, fmt="csv")
    assert {f.name for f in schema.fields} == {"link", "company", "n"}
    back = read_table(spark, path, fmt="csv", schema=schema)
    assert back.count() == 3


def test_partitioned_write_prunes(spark, tmp_path):
    import io as _io
    from contextlib import redirect_stdout

    path = str(tmp_path / "parts")
    df = spark.createDataFrame(ROWS, SCHEMA).withColumn(
        "bucket", F.col("n") % 2
    )
    write_table(df, path, partition_by=["bucket"])
    back = read_table(spark, path).filter(F.col("bucket") == 1)
    assert {r.n for r in back.collect()} == {1, 3}
    buf = _io.StringIO()
    with redirect_stdout(buf):
        back.explain(mode="formatted")
    # hive-layout partition filter never reaches the row scan
    assert "PartitionFilters: [isnotnull(bucket" in buf.getvalue()


def test_bucketed_write_requires_table_name(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="table_name"):
        write_table(df, str(tmp_path / "x"), bucket_by=(4, "n"))


def test_json_corrupt_records_are_quarantined(spark, tmp_path):
    """PERMISSIVE + explicit schema keeps malformed rows visible in
    _corrupt_record instead of failing the 100 TB job — the source-
    boundary twin of the pipeline's dead-letter channel."""
    from pyspark.sql.types import StringType, StructField, StructType

    p = tmp_path / "feed"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"link": "https://a.example", "company": "Acme"}\n'
        "{this is not json}\n"
        '{"link": "https://b.example", "company": "Globex"}\n'
    )
    schema = StructType(
        [
            StructField("link", StringType()),
            StructField("company", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = read_table(spark, str(p), fmt="json", schema=schema).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2 and bad.count() == 1
    assert "not json" in bad.collect()[0]._corrupt_record


def test_compact_dir_merges_files_and_preserves_rows(spark, tmp_path):
    from joblink_etl_spark.sources.io import compact_dir

    src, dst = str(tmp_path / "many"), str(tmp_path / "few")
    df = spark.range(0, 1000).withColumn("k", F.col("id") % 7)
    df.repartition(32).write.parquet(src)
    assert len([p for p in os.listdir(src) if p.endswith(".parquet")]) == 32

    compact_dir(spark, src, dst, target_files=4, sort_cols=["k"])
    files = [p for p in os.listdir(dst) if p.endswith(".parquet")]
    assert len(files) <= 4
    back = spark.read.parquet(dst)
    assert back.count() == 1000
    assert back.agg(F.sum("id")).first()[0] == 499500

    with pytest.raises(ValueError, match="NEW directory"):
        compact_dir(spark, src, src)


def test_merge_partial_aggs_is_order_independent(spark):
    from joblink_etl_spark.operators.incremental import (
        finalize_view,
        merge_partial_aggs,
        partial_aggs,
    )

    df = spark.range(0, 300).select(
        (F.col("id") % 3).cast("string").alias("k"),
        (F.col("id") * 0.25).alias("v"),
    )
    parts = [
        partial_aggs(df.filter(F.col("id") % 3 == i), ["k"], "v") for i in range(3)
    ]
    ab_c = merge_partial_aggs(merge_partial_aggs(parts[0], parts[1], ["k"]), parts[2], ["k"])
    a_bc = merge_partial_aggs(parts[0], merge_partial_aggs(parts[1], parts[2], ["k"]), ["k"])
    direct = partial_aggs(df, ["k"], "v")

    def rows(d):
        return sorted(map(tuple, finalize_view(d, ["k"]).collect()))

    assert rows(ab_c) == rows(a_bc) == rows(direct)
