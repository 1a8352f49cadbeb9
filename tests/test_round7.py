"""Round-7 regression tests.

Covers the r06 advice items: the semdedup conflicting-knobs sentinel,
the exploded (driver-hashable) jl_project projection, and — the
structural fix for the whole class behind the r06 `jl_project` red —
a guard that every query in the driver's 50-slot correctness window
emits only scalar columns, because the driver's row canonicalizer
(pandas sort + hash) dies on array/map/struct cells with
"unhashable type: 'list'".
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import types as T

# The driver hashes the FIRST 50 registered queries (catalog.py
# ordering). Keep in sync with the window size documented there.
DRIVER_WINDOW = 50


def _window_names():
    from joblink_etl_spark.plans import registry

    return list(itertools.islice(registry.queries(), DRIVER_WINDOW))


def test_semdedup_explicit_k_cap_with_cell_target_raises(spark, sf_dir):
    from joblink_etl_spark.operators.similarity import semdedup
    from joblink_etl_spark.sources import table

    emb = table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="not both"):
        semdedup(emb, k_cap=10, cell_target=10)
    # even an explicit None counts as explicit — it used to be the
    # silent-null path that masked caller mistakes
    with pytest.raises(ValueError, match="not both"):
        semdedup(emb, k_cap=None, cell_target=10)


def test_jl_project_output_is_scalar_and_exploded(spark, sf_dir):
    from joblink_etl_spark.plans.select_q import jl_project_q

    out = jl_project_q(spark, sf_dir)
    assert [f.name for f in out.schema.fields] == ["vec_id", "dim", "value"]
    assert all(
        isinstance(f.dataType, T.LongType) for f in out.schema.fields
    ), out.schema
    rows = out.collect()
    n_vec = len({r["vec_id"] for r in rows})
    assert len(rows) == n_vec * 8  # 8 components per vector
    assert {r["dim"] for r in rows} == set(range(8))


def _assert_scalar_only(schema: T.StructType, name: str) -> None:
    for f in schema.fields:
        assert not isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType)
        ), (
            f"driver-window query {name!r} column {f.name!r} has "
            f"non-scalar type {f.dataType.simpleString()} — the "
            f"driver's row canonicalizer cannot hash it (the r06 "
            f"jl_project red); register an exploded/cast projection"
        )


def test_driver_window_queries_emit_only_hashable_scalars(spark, sf_dir):
    """Schema-only sweep of the 50 driver-window plans: any
    array/map/struct output column would reproduce the r06
    jl_project 'unhashable type' driver error."""
    from joblink_etl_spark.plans import registry

    qs = registry.queries()
    for name in _window_names():
        df = qs[name](spark, sf_dir)
        _assert_scalar_only(df.schema, name)
