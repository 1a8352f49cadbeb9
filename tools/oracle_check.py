"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values. Usage:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name, then rows. Values are compared by exact
    repr() — dtype-sensitively: DuckDB rows come from an Arrow table
    (``to_pylist``), so a HUGEINT/decimal output surfaces as
    ``decimal.Decimal`` and fails against Spark's int, exactly like
    the driver's Arrow-level value hash (the r03/r05 session_windows
    red that Python ``fetchall()`` coercion used to mask)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            # exact repr — the driver hashes raw values, so any
            # pre-rounding here would mask real engine divergence
            return repr(v)
        return repr(v)

    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


# Arrow type → coarse class shared by the Spark- and DuckDB-side
# schemas. Classes must MATCH per column; "decimal" is deliberately
# its own class (no Spark query here emits DecimalType, so a decimal
# oracle column is always a DuckDB HUGEINT/DECIMAL leak).
def _arrow_class(t) -> str:
    import pyarrow as pa

    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return "list<" + _arrow_class(t.value_type) + ">"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_map(t):
        return "map"
    return str(t)


def _spark_class(t) -> str:
    from pyspark.sql import types as T

    if isinstance(t, T.DecimalType):
        return "decimal"
    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(t, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, T.StringType):
        return "str"
    if isinstance(t, T.TimestampType):
        return "ts"
    if isinstance(t, T.DateType):
        return "date"
    if isinstance(t, T.BinaryType):
        return "bin"
    if isinstance(t, T.ArrayType):
        return "list<" + _spark_class(t.elementType) + ">"
    if isinstance(t, T.StructType):
        return "struct"
    if isinstance(t, T.MapType):
        return "map"
    return t.simpleString()


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from joblink_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            # builders that lazily persist shared subtrees (PQ
            # codebooks, bloom gram sets) leave their cache lifetime
            # to the caller — drop it between queries like bench.py
            spark.catalog.clearCache()
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only check, {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            if not srows:
                print(f"     WARNING: {name} returned 0 rows")
            continue
        try:
            # Arrow-level fetch: preserves DuckDB's true output dtypes
            # (HUGEINT → decimal128) instead of fetchall()'s Python
            # coercion, mirroring the driver's dtype-sensitive hash
            tbl = con.execute(oracles[name]).fetch_arrow_table()
            dcols = tbl.column_names
            dtypes = {f.name: _arrow_class(f.type) for f in tbl.schema}
            drows = [
                tuple(d[c] for c in dcols) for d in tbl.to_pylist()
            ]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue

        ok = True
        if len(srows) != len(drows):
            ok = False
            print(f"FAIL {name}: row count spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            ok = False
            print(f"FAIL {name}: columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        if ok:
            stypes = {f.name: _spark_class(f.dataType) for f in sdf.schema.fields}
            for c in scols:
                if stypes[c] != dtypes.get(c):
                    ok = False
                    print(
                        f"FAIL {name}: dtype mismatch on '{c}': "
                        f"spark={stypes[c]} duckdb={dtypes.get(c)}"
                    )
        if ok:
            ns, nd = normalize(srows, scols), normalize(drows, dcols)
            if ns != nd:
                ok = False
                diff = [i for i, (a, b) in enumerate(zip(ns, nd)) if a != b][:3]
                print(f"FAIL {name}: value mismatch at sorted rows {diff}")
                for i in diff:
                    print(f"   spark : {ns[i]}")
                    print(f"   duckdb: {nd[i]}")
        if ok:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)

    print(f"\n{n_run - len(failures)}/{n_run} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
