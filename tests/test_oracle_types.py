"""Type-hygiene gate over every registered DuckDB oracle.

The driver hashes query outputs dtype-sensitively at the Arrow level,
so a DuckDB output column that leaks HUGEINT or DECIMAL (e.g. an
uncast windowed ``sum(INTEGER)`` — DuckDB widens it to HUGEINT, which
surfaces as ``decimal128(38,0)`` vs Spark's ``int64``) fails the
driver even when Python-coerced values compare equal. This was the
root cause of the r03/r05 ``session_windows`` hash red.

This test DESCRIBEs every oracle (plans only — no execution) and
fails on any HUGEINT/DECIMAL output column, so the class of bug
cannot re-enter the registry. See .claude/skills/verify/SKILL.md
("cast ::BIGINT anywhere a sum reaches the compared output").
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMALL

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    return c


def _oracles():
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()


def test_no_decimal_or_hugeint_oracle_outputs(con):
    bad = []
    for name, sql in _oracles().items():
        rows = con.execute(f"DESCRIBE {sql}").fetchall()
        for col, typ, *_ in rows:
            t = typ.upper()
            if "HUGEINT" in t or "DECIMAL" in t:
                bad.append((name, col, typ))
    assert not bad, (
        "oracle output columns with driver-incompatible types "
        f"(cast to ::BIGINT or ::DOUBLE): {bad}"
    )


def test_guard_catches_uncast_windowed_sum(con):
    """Meta-test: the DESCRIBE probe actually detects the bug class
    (an uncast windowed sum over INTEGER yields HUGEINT)."""
    rows = con.execute(
        "DESCRIBE SELECT sum(1) OVER () AS s FROM events LIMIT 1"
    ).fetchall()
    assert any("HUGEINT" in r[1].upper() or "DECIMAL" in r[1].upper() for r in rows)
