"""Fuzzy key join via deletion-neighborhood blocking — record
linkage for dirty keys at scale.

The classic trick (FastSS / SymSpell lineage): a pair of strings at
edit distance <= 1 always shares a member of their deletion
neighborhoods (the string itself plus every one-char-deleted
variant). Exploding each side's ~(len+1) variants and hash-joining
on the variant replaces the O(n·m) all-pairs comparison with a
uniform-key equi-join; the exact Levenshtein check runs only on the
candidates that collide. Both the variant generation and the verify
are pure deterministic string math, so the DuckDB oracle replays
them bit-for-bit.

At 100 TB: variants multiply each side by ~key length (bounded by
`max_len`), the join key is md5-uniform, and candidates are rare —
the same candidate-then-verify shape as the minhash/winnowing
families.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(key: Column, max_len: int = 64) -> Column:
    """The deletion-1 neighborhood: the (truncated) key itself plus
    every string obtained by deleting one character. Distinct, so a
    key with repeated characters doesn't emit duplicate variants."""
    k = F.substring(key, 1, max_len)
    dels = F.transform(
        F.sequence(F.lit(1), F.length(k)),
        lambda i: F.concat(
            F.substring(k, 1, i - 1),
            F.substring(k, i + 1, max_len),
        ),
    )
    return F.array_distinct(F.concat(F.array(k), dels))


def fuzzy_key_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    max_distance: int = 1,
    max_len: int = 64,
    dedup_keys: list[str] | None = None,
    broadcast_left: bool = False,
    keys_identify_rows: bool = False,
) -> DataFrame:
    """All (left, right) row pairs whose keys are within Levenshtein
    distance `max_distance` (currently 1 — the guarantee the
    deletion-1 neighborhood provides). Output: left columns + right
    columns + `edit_distance`. Candidates come from the variant
    equi-join; the exact distance verifies each candidate once.

    A candidate pair collides once per shared deletion variant, so
    the join output must be deduplicated. `dedup_keys` names the
    columns that identify a (left row, right row) pair — default
    [left_key, right_key], which is correct ONLY when the join keys
    identify rows on both sides. If either side can repeat a key
    (e.g. two dirty records that happen to share a d_name), pass the
    true row identifiers instead: with the default, same-key rows
    would collapse to one arbitrarily-chosen carrier row and the
    result would be nondeterministic across runs.

    ``broadcast_left``: both variant relations are explode products
    (~key_length rows per input row), and Catalyst's post-Generate
    size estimate is a guess — at the r12 x100 plan audit it chose
    BroadcastExchange on a corpus-derived variant side (the
    misestimated-broadcast class that aborts against
    driver.maxResultSize at cluster scale). The default pins the
    variant equi-join to a spill-safe sort-merge; pass True when the
    LEFT side is a genuinely bounded dirty batch (the daily-feed
    shape) to broadcast its variants explicitly and skip the
    shuffle.

    ``keys_identify_rows``: promise that `dedup_keys` functionally
    determine EVERY carried column (true row identifiers on both
    sides), so variant-collision duplicates are byte-identical rows
    and a full-row distinct() is result-identical to the keyed
    dropDuplicates. The distinct spelling plans as a HashAggregate
    (all columns are grouping keys); the keyed dropDuplicates carries
    the non-key strings in first() buffers, which disqualifies hash
    aggregation — the whole candidate set rides a per-partition SORT
    instead (r15; the span_unit_repeats SortAggregate class). Leave
    False when same-key rows may genuinely differ — there the keyed
    collapse (one arbitrary carrier row) is the documented contract."""
    if max_distance != 1:
        raise ValueError("deletion-1 blocking guarantees distance <= 1 only")
    if dedup_keys is None:
        dedup_keys = [left_key, right_key]
    lv = left.withColumn("_lv", F.explode(deletion_variants(F.col(left_key), max_len)))
    rv = right.withColumn("_rv", F.explode(deletion_variants(F.col(right_key), max_len)))
    lv = F.broadcast(lv) if broadcast_left else lv.hint("merge")
    collided = lv.join(rv, lv["_lv"] == rv["_rv"]).drop("_lv", "_rv")
    cand = (
        collided.distinct()
        if keys_identify_rows
        else collided.dropDuplicates(dedup_keys)
    )
    dist = F.levenshtein(F.col(left_key), F.col(right_key))
    return cand.withColumn("edit_distance", dist.cast("bigint")).filter(
        F.col("edit_distance") <= max_distance
    )
