"""Deletion-neighborhood fuzzy join: the distance-1 guarantee and
the no-false-positive verify."""

from __future__ import annotations

from joblink_etl_spark.operators.fuzzyjoin import deletion_variants, fuzzy_key_join
from pyspark.sql import functions as F


def test_finds_all_edit1_pairs_and_only_those(spark):
    left = spark.createDataFrame(
        [(1, "acme corp"), (2, "beta llc"), (3, "cme corp"), (4, "zzz")],
        "lid BIGINT, lkey STRING",
    )
    right = spark.createDataFrame(
        [(10, "acme corp"),   # exact (d=0)
         (11, "acme c0rp"),   # substitution (d=1)
         (12, "acmecorp"),    # deletion (d=1)
         (13, "aacme corp"),  # insertion (d=1)
         (14, "acme corpse"), # d=2 — must NOT match
         (15, "beta lc")],    # deletion (d=1)
        "rid BIGINT, rkey STRING",
    )
    out = fuzzy_key_join(left, right, "lkey", "rkey").collect()
    pairs = {(r["lid"], r["rid"]): r["edit_distance"] for r in out}
    assert pairs[(1, 10)] == 0
    assert pairs[(1, 11)] == 1
    assert pairs[(1, 12)] == 1
    assert pairs[(1, 13)] == 1
    assert pairs[(2, 15)] == 1
    assert (1, 14) not in pairs          # d=2 excluded by verify
    assert all(d <= 1 for d in pairs.values())
    # "cme corp" is itself d=1 from "acme corp" (insertion)
    assert pairs[(3, 10)] == 1


def test_variant_count_bounded_by_length(spark):
    df = spark.range(1).select(F.lit("abcde").alias("k"))
    v = df.select(F.size(deletion_variants(F.col("k"))).alias("n")).collect()[0]["n"]
    assert v == 6  # the key + 5 single-deletion variants (all distinct)
