"""Central query registry: name → (spark_fn, oracle_sql | None).

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this. Every operator implemented from SURVEY.md §2 registers here so
the driver's DuckDB-oracle correctness gate covers it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name: {name}")
    _REGISTRY[name] = (fn, oracle)


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracles() -> dict[str, str]:
    _ensure_loaded()
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


_LOADED = False


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    from . import catalog  # noqa: F401  (registers everything on import)

    _LOADED = True
