"""Skew mitigation: salted equi-join.

At 100 TB a handful of hot keys (one giant customer, one boilerplate
fingerprint) can pin an entire shuffle partition on one task. AQE's
skew-join split handles sort-merge inputs automatically
(`spark.sql.adaptive.skewJoin.enabled`, on in `session.py`), but it
can't split a *grouped* hot key or help a pre-AQE plan; explicit
salting is the standard fallback and is reproduced here as a
first-class operator.

Semantics: `salted_join(fact, dim, key, n)` ≡ `fact.join(dim, key)`
bit-for-bit — proven by the `salted_join_agg` oracle query, whose
DuckDB SQL is a PLAIN join. The trick: the fact side gets a
deterministic salt in [0, n) hashed from its entire row, the dim side
is replicated n× (one row per salt value), and the join key becomes
(key, salt) — splitting each hot key's rows across n shuffle
partitions while every fact row still meets its dim row exactly once.

Cost model: dim-side replication is n× a SMALL table (that's why the
fact side gets the hash and the dim side the explode, never the
reverse); the fact side — the one that matters — stays 1×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join with the fact side's hot keys split across
    `salt_buckets` shuffle partitions. Result is identical to
    `fact.join(dim, on, how)` for how in {inner, left}; the salt
    column never escapes."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    # deterministic per-row salt: identical reruns produce identical
    # partitioning (no rand() — keeps the operator replayable)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets)).cast(
        "int"
    )
    sf = fact.withColumn("_salt", salt)
    sd = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return sf.join(sd, keys + ["_salt"], how).drop("_salt")
