"""Smoke tests for the driver contract."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_queries_and_oracles_aligned():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must have a query — and every query an oracle,
    # except explicitly-registered iterative algorithms (oracle=None
    # → the driver's rows-only check). Keep that list tiny and
    # justified in plans/catalog.py.
    rows_only = {"lrs_exact", "bpe_merges", "bpe_encode"}
    assert set(oracles) == set(qs) - rows_only


def test_all_queries_run_small(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        # schema must be stable and collectable
        assert df.columns, name
        df.limit(5).collect()
