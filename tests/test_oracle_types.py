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


def test_arrow_and_spark_class_lattices_agree():
    """The two type-class mappers must land matching classes for every
    type pair the oracles legitimately produce — and decimal must be
    its own class on BOTH sides so a HUGEINT leak can never alias."""
    import pyarrow as pa
    from pyspark.sql import types as T

    from tools.oracle_check import _arrow_class, _spark_class

    pairs = [
        (pa.int64(), T.LongType(), "int"),
        (pa.int32(), T.IntegerType(), "int"),
        (pa.float64(), T.DoubleType(), "float"),
        (pa.bool_(), T.BooleanType(), "bool"),
        (pa.string(), T.StringType(), "str"),
        (pa.timestamp("us"), T.TimestampType(), "ts"),
        (pa.date32(), T.DateType(), "date"),
        (pa.binary(), T.BinaryType(), "bin"),
        (pa.list_(pa.float32()), T.ArrayType(T.FloatType()), "list<float>"),
        (
            pa.struct([("a", pa.int64())]),
            T.StructType([T.StructField("a", T.LongType())]),
            "struct",
        ),
    ]
    for at, st, cls in pairs:
        assert _arrow_class(at) == cls, at
        assert _spark_class(st) == cls, st
    assert _arrow_class(pa.decimal128(38, 0)) == "decimal"
    assert _spark_class(T.DecimalType(38, 0)) == "decimal"
    # the regression class: decimal must NOT equal int
    assert _arrow_class(pa.decimal128(38, 0)) != _arrow_class(pa.int64())


def test_pca_power_signed_floor_parity(spark):
    """Pin the pca_power oracle's signed-floor spelling (ADVICE r10).

    The r10 sf0.001 sweep caught DuckDB integer ``//`` TRUNCATING
    toward zero (-110170 // 65536 = -1) where Spark's
    ``shiftright(x, 16)`` FLOORS (= -2); the oracle now spells floor
    via the non-negative magnitude (ext_q.py PCA_POWER_SQL, y1s CTE).
    That bug was invisible at sf0.01/0.1 (all component sums
    non-negative there), so this test pins the negative-operand branch
    directly: the oracle's exact CASE expression on DuckDB must equal
    Spark's shiftright for a signed battery spanning both signs,
    exact multiples, and the original failing value.
    """
    import duckdb as _dd

    from joblink_etl_spark.plans import ext_q

    # the spelling must stay in the oracle — a future edit back to
    # bare `//` on the signed domain would silently regress sf0.001
    assert "ELSE -((-y1v + 65535) // 65536) END" in ext_q.PCA_POWER_SQL

    battery = [-110170, -131072, -65537, -65536, -65535, -1, 0, 1,
               65535, 65536, 65537, 110170, 2**40 + 123, -(2**40) - 123]
    con = _dd.connect()
    duck = [
        con.execute(
            "SELECT CASE WHEN y1v >= 0 THEN y1v // 65536 "
            "ELSE -((-y1v + 65535) // 65536) END FROM (SELECT ?::BIGINT AS y1v)",
            [v],
        ).fetchone()[0]
        for v in battery
    ]
    sdf = spark.createDataFrame([(v,) for v in battery], "y1v long")
    got = [
        r.ys
        for r in sdf.selectExpr("y1v", "shiftright(y1v, 16) AS ys")
        .orderBy("y1v")
        .collect()
    ]
    want = [d for _, d in sorted(zip(battery, duck))]
    assert got == want
    # and both equal the arithmetic-shift ground truth
    assert got == [v >> 16 for v in sorted(battery)]
