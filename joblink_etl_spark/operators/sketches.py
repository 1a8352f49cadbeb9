"""Deterministic distinct-count sketching (KMV — k minimum values).

Spark's production path for approximate cardinality is the built-in
HLL++ `approx_count_distinct`, but its estimate is engine-internal
and not reproducible across engines, so it can't be oracle-verified.
KMV is the classic alternative whose state IS a pure function of the
data: keep the k smallest (md5) hash values per group; if the k-th
smallest normalized hash is u, the group has ≈ (k-1)/u distinct
values (Bar-Yossef et al. 2002, "Counting distinct elements in a
data stream"). Every byte of the sketch derives from md5, so DuckDB
replays the estimate bit-for-bit.

Scale design (100 TB):
- The per-group distinct on (group, hash) is a map-side-combinable
  HashAggregate — the shuffle carries one row per distinct value at
  most, and AQE coalesces.
- The rank-filter (row_number ≤ k) then reduces each group to k
  rows; the final agg is over |groups| × k rows, trivially small.
- For extreme cardinality per group, swap the exact distinct for a
  per-partition top-k pre-combine (sort each partition's hashes and
  keep k) — same estimate, bounded shuffle; the built-in
  approx_count_distinct remains the right default when cross-engine
  determinism isn't required.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_int

HASH_SPACE = float(1 << 60)  # md5_int range: [0, 2^60)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str | Column,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate from the k minimum hash
    values. Exact (= n_seen) when a group has fewer than k distinct
    values; otherwise (k-1) / (kth_smallest_hash / 2^60).

    Returns (group_col, n_seen, est_distinct) with est_distinct
    rounded to 4 decimals identically in the DuckDB oracle.
    """
    from pyspark.sql import Window

    value = F.col(value_col) if isinstance(value_col, str) else value_col
    hashes = df.select(
        group_col, md5_int(value.cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    topk = hashes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    agg = topk.groupBy(group_col).agg(
        F.max("rn").alias("n_seen"), F.max("h").alias("kth")
    )
    est = F.when(F.col("n_seen") < k, F.col("n_seen").cast("double")).otherwise(
        F.lit(float(k - 1)) / (F.col("kth").cast("double") / F.lit(HASH_SPACE))
    )
    return agg.select(
        group_col, "n_seen", F.round(est, 4).alias("est_distinct")
    )


def make_geo_mean_udaf():
    """Grouped-aggregate pandas UDF (the Spark UDAF form): geometric
    mean — the right average for heavy-tailed per-document quality/
    size metrics, and a builtin Spark lacks. Arrow ships each group's
    column once; numpy reduces it vectorized. Usable in groupBy().agg
    and as a window function.

    Scale caveat (why this is the demo, not the default): grouped-agg
    pandas UDFs have no partial aggregation — each group's values
    ship whole to one worker, so keys must have bounded group sizes.
    For algebraic aggregates prefer built-ins (exp(avg(ln(x))) here)
    which combine map-side.

    Note: ``pd``/``np`` must be module-level imports — with
    ``from __future__ import annotations`` the hint strings resolve
    against module globals, and a function-local import leaves the
    grouped-agg signature (Series -> float) uninferable."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        a = v.dropna().to_numpy(dtype="float64")
        a = a[a > 0]
        if a.size == 0:
            return float("nan")
        return float(np.exp(np.log(a).mean()))

    return geo_mean


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable frequency estimation. Like KMV, the
# whole sketch is a pure md5-derived function of the data, so a
# DuckDB oracle replays estimates bit-for-bit (Spark's built-in
# count_min_sketch aggregate uses engine-internal hashing and can't
# be cross-checked).
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_pos(key: Column, seed: Column, width: int) -> Column:
    """Bucket of `key` under `seed`: md5_int('cms<seed>:<key>') % width."""
    return (
        md5_int(F.concat(F.lit("cms"), seed.cast("string"), F.lit(":"), key)) % width
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Build a count-min sketch over `key_col` as (seed, pos, cnt)
    rows — depth × width counters estimating any key's frequency as
    min over seeds of its bucket count (Cormode & Muthukrishnan 2005).

    Scale design: the explode is scan-side (×depth narrow rows); the
    groupBy is map-side combinable, so the shuffle carries AT MOST
    depth × width rows per map task regardless of input size — the
    sketch is a fixed-size, mergeable summary, the streaming/
    multi-tenant complement to an exact groupBy count."""
    rows = df.select(
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("seed"),
        F.col(key_col).cast("string").alias("_k"),
    )
    return (
        rows.select("seed", _cms_pos(F.col("_k"), F.col("seed"), width).alias("pos"))
        .groupBy("seed", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Estimated frequency for each distinct key in `keys`: probe the
    key's depth buckets, take the min. The sketch (≤ depth × width
    rows) broadcasts; estimates only ever OVER-count (collisions add,
    never subtract), with error ≤ 2N/width at ≥ 1-(1/2)^depth
    probability. Returns (key, est)."""
    ks = keys.select(F.col(key_col).cast("string").alias("key")).distinct()
    probes = ks.select(
        "key",
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("seed"),
    ).withColumn("pos", _cms_pos(F.col("key"), F.col("seed"), width))
    return (
        probes.join(F.broadcast(sketch), ["seed", "pos"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("est"))
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram quantiles: the mergeable/streaming counterpart
# of the exact rank-interpolation percentiles (plans/events_q.py).
# Spark's percentile_approx (KLL-ish) is engine-internal; a fixed
# equi-width histogram between the in-plan min/max is the classic
# deterministic alternative.
# ---------------------------------------------------------------------------


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bins: int = 256,
) -> DataFrame:
    """Approximate quantiles from a fixed-width histogram: bin the
    values between min/max (both derived IN-PLAN as a broadcast
    one-row aggregate — no driver action), accumulate a cumulative
    histogram (≤ `bins` rows — the window sort is over the sketch,
    never the data), and report each quantile as the UPPER EDGE of
    the first bin whose cumulative count reaches ceil(q·n). Error is
    bounded by one bin width; every arithmetic step is plain IEEE
    double math, so the oracle replays it exactly.

    Scale design: one scan + one map-side-combinable groupBy whose
    shuffle carries ≤ bins rows per map task; histograms from
    different partitions/days/streams merge by addition.

    Returns (q, bin, est)."""
    bounds = df.agg(
        F.min(F.col(value_col).cast("double")).alias("_lo"),
        F.max(F.col(value_col).cast("double")).alias("_hi"),
    )
    binned = (
        df.select(F.col(value_col).cast("double").alias("_v"))
        .filter(F.col("_v").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            F.when(F.col("_hi") <= F.col("_lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.floor(
                        (F.col("_v") - F.col("_lo"))
                        / (F.col("_hi") - F.col("_lo"))
                        * bins
                    ),
                    F.lit(bins - 1),
                )
            )
            .cast("int")
            .alias("bin")
        )
    )
    hist = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql.window import Window

    cum = hist.withColumn(
        "cum", F.sum("cnt").over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0))
    )
    total = hist.agg(F.sum("cnt").alias("_n"))
    qrows = bounds.select(
        "_lo",
        "_hi",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    ).crossJoin(F.broadcast(total))
    picked = (
        qrows.join(
            F.broadcast(cum),
            F.col("cum") >= F.ceil(F.col("q") * F.col("_n")).cast("bigint"),
        )
        .groupBy("q", "_lo", "_hi", "_n")
        .agg(F.min("bin").alias("bin"))
    )
    est = F.when(F.col("_hi") <= F.col("_lo"), F.col("_hi")).otherwise(
        F.least(
            F.col("_lo")
            + (F.col("bin") + 1).cast("double") / bins * (F.col("_hi") - F.col("_lo")),
            F.col("_hi"),
        )
    )
    return picked.select("q", "bin", est.alias("est")).orderBy("q")


def quantile_bins(
    df: DataFrame,
    value_col: str,
    n_bins_out: int = 10,
    bins: int = 256,
) -> DataFrame:
    """Equal-frequency binning (ML feature prep) the scale-correct
    way: a global-sort ntile would funnel the corpus through one
    partition, so instead the (n_bins_out - 1) cutpoints come from
    the mergeable histogram sketch, ride back as ONE broadcast row,
    and each row's bucket is a scan-side count of cutpoints ≤ value —
    one corpus scan for the sketch, one for the assignment, no global
    sort, equal-frequency up to the sketch's one-bin error.

    Appends `bucket` (1-based)."""
    qs = tuple(i / n_bins_out for i in range(1, n_bins_out))
    cuts = (
        histogram_quantiles(df, value_col, qs=qs, bins=bins)
        .groupBy()
        .agg(F.sort_array(F.collect_list("est")).alias("_cuts"))
    )
    bucket = F.lit(1) + F.aggregate(
        F.col("_cuts"),
        F.lit(0),
        lambda acc, c: acc
        + F.when(F.col(value_col).cast("double") > c, F.lit(1)).otherwise(F.lit(0)),
    )
    return (
        df.crossJoin(F.broadcast(cuts))
        .withColumn("bucket", bucket)
        .drop("_cuts")
    )


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV sketch AS STATE: the sorted array of the k
    smallest distinct hashes — the mergeable form you persist
    between batches (streaming_kmv keeps exactly this in the state
    store). Returns (group_col, sketch array<bigint>)."""
    from pyspark.sql import Window

    hashes = df.select(
        group_col, md5_int(F.col(value_col).cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    topk = hashes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return topk.groupBy(group_col).agg(
        F.sort_array(F.collect_list("h")).alias("sketch")
    )


def kmv_merge_estimate(
    sketches: DataFrame,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Merge any number of per-group KMV sketches (rows may repeat a
    group — e.g. one sketch per shard/day) and estimate: k-smallest
    of the union of k-smallest sets IS the k-smallest of the union,
    so the merged estimate is bit-identical to a from-scratch build.
    Input rows: (group_col, sketch array<bigint>); output matches
    kmv_distinct: (group_col, n_seen, est_distinct)."""
    from pyspark.sql import Window

    exploded = sketches.select(
        group_col, F.explode("sketch").alias("h")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    topk = exploded.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    agg = topk.groupBy(group_col).agg(
        F.max("rn").alias("n_seen"), F.max("h").alias("kth")
    )
    est = F.when(F.col("n_seen") < k, F.col("n_seen").cast("double")).otherwise(
        F.lit(float(k - 1)) / (F.col("kth").cast("double") / F.lit(HASH_SPACE))
    )
    return agg.select(group_col, "n_seen", F.round(est, 4).alias("est_distinct"))


def hll_registers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    m: int = 64,
) -> DataFrame:
    """HyperLogLog register state per group, engine-exact.

    Bucket = h % m; rank = leading-zero count of the remaining
    54-bit word + 1, computed as 55 - bitlength(w) (bitlength via
    the binary-string length — identical in Spark ``bin()`` and
    DuckDB ``format('{:b}',…)``; w = 0 ⇒ rank 55). Registers are
    max-merged — the HLL algebra. Returns one row per (group,
    bucket) with the register value; fully deterministic.
    """
    base = df.select(
        F.col(group_col), md5_int(F.col(value_col).cast("string")).alias("_h")
    )
    # integer div — a double round-trip above 2^53 drops low bits
    w = F.expr(f"_h div {m}")
    rank = F.when(w > 0, F.lit(55) - F.length(F.bin(w))).otherwise(F.lit(55))
    return (
        base.select(
            F.col(group_col),
            (F.col("_h") % m).cast("int").alias("bucket"),
            rank.cast("int").alias("rank"),
        )
        .groupBy(group_col, "bucket")
        .agg(F.max("rank").alias("register"))
    )


def hll_estimate(
    registers: DataFrame,
    group_col: str,
    m: int = 64,
) -> DataFrame:
    """Raw HLL estimate from register state, via EXACT integer
    sufficient statistics: Σ 2^(-M_j) scaled by 2^55 is an exact
    bigint (M_j <= 55), empty buckets contribute 2^55 each. The only
    float op is ONE multiply+divide at the end (IEEE-identical
    across engines), so the driver can hash-check an HLL — the
    ln-based small/large-range corrections are deliberately left to
    the consumer (they would put libm's ln in the hash path).
    Output: (group, n_buckets_used, inv_sum_scaled, est_distinct)."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    full = F.lit(1 << 55).cast("bigint")
    agg = registers.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_buckets_used"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 55 - register)"))
        .cast("bigint")
        .alias("used_inv"),
    )
    inv_scaled = F.col("used_inv") + (F.lit(m) - F.col("n_buckets_used")) * full
    est = (
        F.lit(alpha * m * m) * full.cast("double") / inv_scaled.cast("double")
    )
    return agg.select(
        group_col,
        "n_buckets_used",
        inv_scaled.alias("inv_sum_scaled"),
        F.round(est, 4).alias("est_distinct"),
    )


def kmv_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Theta-sketch set-operation estimates from two KMV sketches:
    distinct-union, distinct-intersection, and Jaccard — the
    audience-overlap question answered from two k-long sketches
    instead of a distinct-join over the raw data.

    theta = the k-th smallest hash of the sketch union; every
    common hash below theta is a uniform sample of the
    intersection at rate theta/2^60, so
    est_inter = |common below theta| * 2^60 / theta. One row out;
    single IEEE divisions only — engine-exact."""
    ha = df_a.select(md5_int(F.col(value_col).cast("string")).alias("h")).distinct()
    hb = df_b.select(md5_int(F.col(value_col).cast("string")).alias("h")).distinct()
    top = lambda d: d.orderBy("h").limit(k)
    sa, sb = top(ha), top(hb)
    union_k = top(sa.unionByName(sb).distinct())
    theta = union_k.agg(F.max("h").alias("theta"), F.count(F.lit(1)).alias("n_u"))
    common = (
        sa.join(sb, "h")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") <= F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    est_union = F.when(
        F.col("n_u") < k, F.col("n_u").cast("double")
    ).otherwise(F.lit(float(k - 1)) / (F.col("theta").cast("double") / F.lit(HASH_SPACE)))
    scale = F.when(F.col("n_u") < k, F.lit(1.0)).otherwise(
        F.lit(HASH_SPACE) / F.col("theta").cast("double")
    )
    return (
        theta.crossJoin(F.broadcast(common))
        .select(
            F.col("n_u").cast("bigint").alias("union_sample"),
            F.col("n_common").cast("bigint").alias("common_sample"),
            F.round(est_union, 4).alias("est_union"),
            F.round(F.col("n_common").cast("double") * scale, 4).alias("est_intersection"),
        )
        .withColumn(
            "jaccard_est",
            F.when(
                F.col("est_union") > 0,
                F.round(F.col("est_intersection") / F.col("est_union"), 4),
            ).otherwise(F.lit(0.0)),
        )
    )


def cms_join_size(
    sketch_a: DataFrame, sketch_b: DataFrame, depth: int = CMS_DEPTH
) -> DataFrame:
    """Equi-join cardinality estimation from two count-min sketches
    over the join key (the AGMS/CM inner-product estimator, Cormode &
    Muthukrishnan 2005 §4.2): per seed row, the inner product
    Σ_pos cntA(pos)·cntB(pos) over-estimates Σ_k fA(k)·fB(k) =
    |A ⋈ B| (hash collisions only ever ADD cross terms); min over
    the depth seeds is the estimate.

    This is how an optimizer sizes a join WITHOUT running it: both
    inputs were already summarized to ≤ depth×width counters (built
    map-side-combined, mergeable across partitions/days), and the
    estimate itself joins two sketch-sized relations — the fact
    tables never participate. Returns one row (est_join_size)."""
    j = (
        sketch_a.alias("a")
        .join(sketch_b.alias("b"), ["seed", "pos"])
        .groupBy("seed")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("ip"))
    )
    return j.groupBy().agg(F.min("ip").cast("bigint").alias("est_join_size"))


def merged_quantile_summary(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_shards: int = 16,
    k_per_shard: int = 32,
    q_pcts: tuple = (10, 25, 50, 75, 90),
) -> DataFrame:
    """Mergeable two-level quantile summary — the MRL/GK-family
    pattern a distributed engine actually runs: each shard keeps an
    equi-depth summary of k values (rank-boundary rows, integer-exact
    selection: rank rn is kept iff floor(rn·k/n) advances), summaries
    union (n_shards·k rows total) and the global weighted rank answers
    any quantile with rank error ≤ N/k per shard. Deterministic
    end-to-end: shard = md5(id) mod n_shards, ties break on id, so
    the summary — and therefore the answer — is engine- and
    partitioning-reproducible, unlike sampled sketches.

    Output: (q_pct, target_rank, approx_value) per requested
    percentile, where target_rank = ceil(q·N/100).

    Scale: the corpus is touched by ONE shard-keyed window (rank
    within shard); everything after runs on the n_shards·k summary —
    the single-partition global window is over the SUMMARY, never the
    corpus. Raising k tightens error linearly at linear summary
    cost."""
    from pyspark.sql.window import Window

    v, i = F.col(value_col), F.col(id_col)
    base = df.select(
        v.alias("val"),
        i.alias("rid"),
        F.pmod(md5_int(F.concat(F.lit("qsum:"), i.cast("string"))), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
    )
    ws = Window.partitionBy("shard").orderBy("val", "rid")
    ranked = base.withColumn("rn", F.row_number().over(ws).cast("bigint")).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("shard")).cast("bigint")
    )
    sel = ranked.filter(
        F.expr(f"(rn * {k_per_shard}) div n > ((rn - 1) * {k_per_shard}) div n")
    )
    wsel = Window.partitionBy("shard").orderBy("rn")
    summary = sel.withColumn(
        "w", (F.col("rn") - F.coalesce(F.lag("rn").over(wsel), F.lit(0))).cast("bigint")
    )
    wg = Window.orderBy("val", "shard", "rn").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = summary.withColumn("cum", F.sum("w").over(wg).cast("bigint"))
    total = base.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    targets = None
    for q in q_pcts:
        t = total.select(
            F.lit(q).cast("bigint").alias("q_pct"),
            F.expr(f"({q} * _n + 99) div 100").alias("target_rank"),
        )
        targets = t if targets is None else targets.unionAll(t)
    return (
        cum.crossJoin(F.broadcast(targets))
        .filter(F.col("cum") >= F.col("target_rank"))
        .groupBy("q_pct", "target_rank")
        .agg(F.expr("min_by(val, cum)").alias("approx_value"))
    )


def bitmap_overlap(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n_bits: int = 1024,
    salt: str = "bm",
) -> DataFrame:
    """Presence-bitmap (linear counting) overlap between groups: each
    group's member set compresses to an n_bits bitmap (md5 bucket →
    one bit, stored as ceil(n_bits/63) bigint words — 63 usable bits
    per word so the oracle's checked shift never touches the sign
    bit — via a bit_or aggregate); pairwise overlap is
    popcount(AND) summed over words.
    The bitmap is the third sketch family beside KMV and HLL — exact
    while distinct members ≤ bits (no collisions at the oracle's
    scale), gracefully approximate past it, and mergeable by OR.

    Output per group pair: bucket counts, common buckets, and the
    bucket-space Jaccard in basis points.

    Scale: state is n_bits/8 BYTES per group regardless of
    cardinality; the word-keyed pair join touches |groups|²·words
    rows — groups are category-sized (types, sources), never ids."""
    b = F.pmod(
        md5_int(F.concat(F.lit(salt + ":"), F.col("id").cast("string"))),
        F.lit(n_bits),
    )
    base = (
        df.select(F.col(group_col).alias("grp"), F.col(id_col).alias("id"))
        .distinct()
        .withColumn("_b", b)
        .select(
            "grp",
            # 63 usable bits per word: DuckDB's checked << overflows
            # on bit 63 where Spark's shiftleft silently wraps to the
            # sign bit — stay in the common safe range
            F.expr("_b div 63").alias("word"),
            F.expr("shiftleft(cast(1 as bigint), cast(_b % 63 as int))").alias("bit"),
        )
    )
    wmaps = base.groupBy("grp", "word").agg(F.expr("bit_or(bit)").alias("w"))
    a = wmaps.select(F.col("grp").alias("grp_a"), "word", F.col("w").alias("wa"))
    c = wmaps.select(F.col("grp").alias("grp_b"), "word", F.col("w").alias("wb"))
    common = (
        a.join(c, "word")
        .filter(F.col("grp_a") < F.col("grp_b"))
        .groupBy("grp_a", "grp_b")
        .agg(F.sum(F.expr("bit_count(wa & wb)")).cast("bigint").alias("common_buckets"))
    )
    sizes = wmaps.groupBy("grp").agg(
        F.sum(F.expr("bit_count(w)")).cast("bigint").alias("n_buckets")
    )
    return (
        common.join(
            F.broadcast(sizes.select(F.col("grp").alias("grp_a"), F.col("n_buckets").alias("buckets_a"))),
            "grp_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("grp").alias("grp_b"), F.col("n_buckets").alias("buckets_b"))),
            "grp_b",
        )
        .select(
            "grp_a",
            "grp_b",
            "buckets_a",
            "buckets_b",
            "common_buckets",
            F.expr(
                "(10000 * common_buckets) div (buckets_a + buckets_b - common_buckets)"
            ).alias("jaccard_bp"),
        )
    )
