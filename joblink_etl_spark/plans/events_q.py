"""Event-time window queries over the events table — the batch
spellings of the streaming operators (SURVEY.md §2.10 generalized):
tumbling / sliding / session windows, keyed dedup, per-user rates.
The streaming/ package runs the same logic incrementally with
watermarks; these plans give the oracle-checked semantics.

Scale notes: every query shuffles once on its (window-ish) key;
window starts are computed scan-side so partition pruning on a
date-partitioned events table would apply before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import table


def tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling windows per event_type (F.window)."""
    ev = table(spark, sf_dir, "events")
    w = F.window("ts", "10 minutes")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


TUMBLING_COUNTS_SQL = """
SELECT to_timestamp(floor(epoch(ts) / 600) * 600)::TIMESTAMP AS window_start,
       to_timestamp(floor(epoch(ts) / 600) * 600 + 600)::TIMESTAMP AS window_end,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


def sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes — each event lands
    in two windows."""
    ev = table(spark, sf_dir, "events")
    w = F.window("ts", "10 minutes", "5 minutes")
    return (
        # quantize to integer cents BEFORE the sum, then round the
        # 4-decimal average with EXACT integer round-half-up division
        # ((2a + b) div 2b). The previous round(round(sum,2)/count,4)
        # still diverged at sf0.1: quotients like 951.27/24 sit on
        # exact .xxxx5 midpoints where Spark's HALF_UP-on-double and
        # DuckDB's rounding disagree — no float round of a float
        # quotient is portable on midpoints; integer math is.
        ev.withColumn("_c", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
        .groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_c").alias("_sc"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            (
                F.expr("(2 * _sc * 100 + n_events) div (2 * n_events)").cast("double")
                / F.lit(10000.0)
            ).alias("avg_value"),
        )
    )


SLIDING_AVG_SQL = """
WITH assigned AS (
  SELECT to_timestamp(floor(epoch(ts) / 300) * 300 - o.off)::TIMESTAMP AS window_start, value
  FROM events, (SELECT unnest([0, 300]) AS off) o
  WHERE epoch(ts) >= floor(epoch(ts) / 300) * 300 - o.off
    AND epoch(ts) < floor(epoch(ts) / 300) * 300 - o.off + 600
)
SELECT window_start,
       window_start + INTERVAL 10 MINUTE AS window_end,
       count(*) AS n_events,
       -- integer round-half-up division (cents scaled to 1e-4), cast
       -- off HUGEINT before the one IEEE division — bit-identical to
       -- Spark's div idiom for the non-negative domain
       ((2 * sum(floor(value * 100 + 0.5)::BIGINT) * 100 + count(*))
        // (2 * count(*)))::BIGINT::DOUBLE / 10000.0 AS avg_value
FROM assigned
GROUP BY 1, 2
"""


def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 5-minute inactivity gap, computed the
    portable way (lag + gap-flag + running sum); Spark's native
    session_window() is exercised in the streaming tests."""
    ev = table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(by_user) > 300,
        1,
    ).otherwise(0)
    sess = (
        ev.withColumn("new_session", gap)
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                by_user.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        sess.withColumn(
            # quantize BEFORE the sum: summing raw doubles is
            # partition-order dependent in the last ulp, and rounding
            # the float sum to 2 decimals flips at half-cent
            # boundaries (the exact idiom used by time_weighted_avg).
            "cents",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("cents").cast("double") / F.lit(100.0)).alias("sum_value"),
        )
    )


SESSION_WINDOWS_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 300 THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  -- CAST is load-bearing: DuckDB's windowed sum(INTEGER) returns
  -- HUGEINT, which surfaces as Arrow decimal128(38,0) vs Spark's
  -- int64 and fails the driver's dtype-sensitive value hash (the
  -- r03/r05 session_windows red; see VERDICT round 5 "What's wrong").
  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       sum(floor(value * 100 + 0.5)::BIGINT)::DOUBLE / 100.0 AS sum_value
FROM sessions
GROUP BY user_id, session_id
"""


def event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the earliest occurrence (ST4's exactly-
    once sink rule) over a corpus with planted duplicate event_ids."""
    ev = table(spark, sf_dir, "events")
    dups = ev.filter(F.col("event_id") % 9 == 0).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1 HOUR")
    )
    corpus = ev.unionAll(dups)
    w = Window.partitionBy("event_id").orderBy("ts")
    return (
        corpus.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "ts", "user_id", "event_type")
    )


EVENT_DEDUP_SQL = """
WITH corpus AS (
  SELECT * FROM events
  UNION ALL
  SELECT event_id, ts + INTERVAL 1 HOUR, user_id, event_type, value, props
  FROM events WHERE event_id % 9 = 0
)
SELECT event_id, min(ts) AS ts,
       arg_min(user_id, ts) AS user_id,
       arg_min(event_type, ts) AS event_type
FROM corpus GROUP BY event_id
"""


def user_hourly_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per user per hour plus each user's busiest hour rank —
    the windowed-rate-control building block (ST3)."""
    ev = table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    counts = ev.groupBy(F.col("user_id"), hour.alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc(), F.col("hour"))
    return counts.withColumn("busy_rank", F.row_number().over(w)).filter(
        F.col("busy_rank") <= 3
    )


USER_HOURLY_RATES_SQL = """
WITH counts AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT user_id, hour, n_events,
       row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC, hour) AS busy_rank
FROM counts
QUALIFY busy_rank <= 3
"""


def event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: attribute each click to the views by the same
    user in the preceding 30 minutes — the batch twin of
    streaming/pipeline.py::stream_interval_join (same semantics, but
    oracle-checked; the streaming variant adds watermark-bounded
    state eviction).

    The time arithmetic stays in integer microseconds end to end so
    the boundary compares are engine-exact. Physically this is an
    equi-join on user_id with range residuals — one shuffle, no
    expansion beyond true matches."""
    ev = table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.unix_micros("ts").alias("view_us"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("click_us"),
    )
    return (
        v.join(
            c,
            (v.user_id == c.c_user)
            & (c.click_us >= v.view_us)
            & (c.click_us <= v.view_us + F.lit(1_800_000_000)),
        )
        .select(
            "user_id",
            "view_id",
            "click_id",
            (F.col("click_us") - F.col("view_us")).alias("delay_us"),
        )
    )


EVENT_ATTRIBUTION_SQL = """
WITH v AS (
  SELECT user_id, event_id AS view_id, epoch_us(ts) AS view_us
  FROM events WHERE event_type = 'view'
), c AS (
  SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
  FROM events WHERE event_type = 'click'
)
SELECT v.user_id, view_id, click_id, click_us - view_us AS delay_us
FROM v JOIN c ON v.user_id = c.user_id
AND click_us >= view_us
AND click_us <= view_us + 1800000000
"""


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (p50/p95) without a global sort:
    rank within group (one shuffle), pick the two straddling ranks,
    interpolate. The interpolation v0 + frac·(v1−v0) is spelled
    identically in the oracle so doubles stay bit-identical — engine
    quantile builtins differ in op order, so we don't use them.

    Scale: only rank rows r0/r0+1 per group survive the rank filter;
    everything else is a narrow pass over the grouped sort. approx:
    `approx_percentile` is the sketch path (see tests)."""
    ev = table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_type",
        "value",
        (F.row_number().over(w) - 1).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    out = []
    for name, p in (("p50", 0.5), ("p95", 0.95)):
        h = (F.col("n") - 1).cast("double") * F.lit(p)
        r0 = F.floor(h)
        picked = (
            ranked.filter((F.col("rn") == r0) | (F.col("rn") == r0 + 1))
            .groupBy("event_type")
            .agg(
                F.min(F.when(F.col("rn") == F.floor((F.col("n") - 1).cast("double") * F.lit(p)), F.col("value"))).alias("v0"),
                F.min(F.when(F.col("rn") == F.floor((F.col("n") - 1).cast("double") * F.lit(p)) + 1, F.col("value"))).alias("v1"),
                F.min((F.col("n") - 1).cast("double") * F.lit(p) - F.floor((F.col("n") - 1).cast("double") * F.lit(p)).cast("double")).alias("frac"),
            )
            .select(
                "event_type",
                F.round(
                    F.col("v0")
                    + F.col("frac") * (F.coalesce(F.col("v1"), F.col("v0")) - F.col("v0")),
                    4,
                ).alias(name),
            )
        )
        out.append(picked)
    return out[0].join(out[1], "event_type").orderBy("event_type")


VALUE_PERCENTILES_SQL = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) - 1 AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
), pick AS (
  SELECT event_type, p,
         min(CASE WHEN rn = floor((n - 1)::DOUBLE * p) THEN value END) AS v0,
         min(CASE WHEN rn = floor((n - 1)::DOUBLE * p) + 1 THEN value END) AS v1,
         min((n - 1)::DOUBLE * p - floor((n - 1)::DOUBLE * p)::DOUBLE) AS frac
  FROM ranked, (SELECT unnest([0.5::DOUBLE, 0.95::DOUBLE]) AS p) ps
  WHERE rn = floor((n - 1)::DOUBLE * p) OR rn = floor((n - 1)::DOUBLE * p) + 1
  GROUP BY 1, 2
)
SELECT a.event_type,
       round(a.v0 + a.frac * (coalesce(a.v1, a.v0) - a.v0), 4) AS p50,
       round(b.v0 + b.frac * (coalesce(b.v1, b.v0) - b.v0), 4) AS p95
FROM pick a JOIN pick b ON a.event_type = b.event_type AND a.p = 0.5 AND b.p = 0.95
ORDER BY a.event_type
"""


def user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type counts as columns (explicit value
    list — at scale an implicit pivot adds a distinct-values job and
    nondeterministic column order)."""
    ev = table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .orderBy("user_id")
    )
    return out.select("user_id", *[F.col(t).cast("bigint").alias(t) for t in types])


USER_EVENT_MATRIX_SQL = """
SELECT user_id,
       count(*) FILTER (event_type = 'click') AS click,
       count(*) FILTER (event_type = 'error') AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup') AS signup,
       count(*) FILTER (event_type = 'view') AS view
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel per user — view, then a click within an hour
    after the first view, then a purchase within an hour after that
    click — rolled up to users-per-stage. Timestamps compare as
    integer microseconds (engine-exact). Three small keyed aggregates
    + two broadcast-sized joins; the events scan is the only big
    input."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("us").alias("v_us")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("us") > F.col("v_us")) & (F.col("us") <= F.col("v_us") + F.lit(3_600_000_000)))
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("us") > F.col("c_us")) & (F.col("us") <= F.col("c_us") + F.lit(3_600_000_000)))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    staged = (
        v.join(c.select("user_id", F.lit(1).alias("clicked")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("purchased")), "user_id", "left")
        .select(
            F.when(F.col("purchased").isNotNull(), F.lit(3))
            .when(F.col("clicked").isNotNull(), F.lit(2))
            .otherwise(F.lit(1))
            .alias("stage")
        )
    )
    return (
        staged.groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("stage")
    )


CONVERSION_FUNNEL_SQL = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
), v AS (
  SELECT user_id, min(us) AS v_us FROM ev WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT ev.user_id, min(us) AS c_us
  FROM ev JOIN v ON ev.user_id = v.user_id
  WHERE event_type = 'click' AND us > v_us AND us <= v_us + 3600000000 GROUP BY 1
), p AS (
  SELECT ev.user_id, min(us) AS p_us
  FROM ev JOIN c ON ev.user_id = c.user_id
  WHERE event_type = 'purchase' AND us > c_us AND us <= c_us + 3600000000 GROUP BY 1
)
SELECT CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2
            ELSE 1 END AS stage,
       count(*) AS n_users
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON v.user_id = p.user_id
GROUP BY 1
ORDER BY 1
"""


def user_activity_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2-style validity intervals from an event stream: each
    (user, event_type) observation is valid from its timestamp until
    the user's next event — `lead()` over the per-user window, the
    single-shuffle interval builder every warehouse dimension load
    uses. Open intervals (latest per user) get NULL valid_to and
    is_current=true. Integer-µs timestamps keep boundaries exact."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("valid_from_us")
    )
    w = Window.partitionBy("user_id").orderBy("valid_from_us", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        "valid_from_us",
        F.lead("valid_from_us").over(w).alias("valid_to_us"),
        F.lead("valid_from_us").over(w).isNull().alias("is_current"),
    )


USER_ACTIVITY_SCD2_SQL = """
SELECT user_id, event_id, event_type,
       epoch_us(ts) AS valid_from_us,
       lead(epoch_us(ts)) OVER w AS valid_to_us,
       lead(epoch_us(ts)) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
"""


def throttled_links_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalence spelling of the streaming rate limiter (ST3,
    streaming/pipeline.throttled_links): events become link edits
    keyed by event_type, throttled to 50 admissions per key per
    UTC day. Runs the SAME pandas admit loop as the stateful
    streaming operator — this query is its driver-checked oracle."""
    from ..streaming.pipeline import throttled_links_batch

    ev = table(spark, sf_dir, "events")
    links = ev.select(
        F.col("event_type").alias("sheet_name"),
        F.col("event_id").alias("row_index"),
        F.concat(F.lit("https://example.com/jobs/"), F.col("event_id")).alias("url"),
        F.col("ts").alias("edited_at"),
    )
    return throttled_links_batch(links, per_key_limit=50, window_seconds=86400)


THROTTLED_LINKS_SQL = """
WITH links AS (
  SELECT event_type AS sheet_name,
         event_id   AS row_index,
         'https://example.com/jobs/' || event_id::VARCHAR AS url,
         ts::TIMESTAMP AS edited_at,
         floor(epoch(ts::TIMESTAMP))::BIGINT AS e
  FROM events
)
SELECT sheet_name, row_index, url, edited_at,
       row_number() OVER (
         PARTITION BY sheet_name, e - e % 86400
         ORDER BY edited_at, row_index
       ) <= 50 AS admitted
FROM links
"""


def stream_interval_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalence spelling of the watermarked stream-stream
    interval join (streaming/pipeline.stream_interval_join): views
    joined to same-user clicks that follow within 12 hours. The
    SAME operator function runs here on batch inputs (withWatermark
    is a no-op in batch), so the driver row checks the exact join
    condition the streaming path uses."""
    from ..streaming.pipeline import stream_interval_join

    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view")
    clicks = ev.filter(F.col("event_type") == "click")
    return stream_interval_join(views, clicks, key="user_id", max_delay="12 hours")


STREAM_INTERVAL_JOIN_SQL = """
SELECT l.user_id AS join_key,
       l.ts::TIMESTAMP AS l_ts, l.event_type AS l_type, l.event_id AS l_event_id,
       r.ts::TIMESTAMP AS r_ts, r.event_type AS r_type, r.event_id AS r_event_id
FROM (SELECT * FROM events WHERE event_type = 'view') l
JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id
 AND r.ts::TIMESTAMP >= l.ts::TIMESTAMP
 AND r.ts::TIMESTAMP <= l.ts::TIMESTAMP + INTERVAL 12 HOUR
"""


def robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: median + MAD (median
    absolute deviation), the breakdown-resistant alternative to
    mean/stddev z-scores — one extreme value cannot move either
    statistic. Both medians use the exact rank+interpolate machinery
    (see value_percentiles: no global sort, only straddling ranks
    survive), and the flag compares |x − med| > 3 · 1.4826 · MAD
    (the Gaussian-consistency constant) with every double op spelled
    identically in the oracle."""
    ev = table(spark, sf_dir, "events").select("event_type", "event_id", "value")

    def exact_median(df: DataFrame, val_col: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(val_col, "event_id")
        ranked = df.select(
            "event_type",
            F.col(val_col).alias("_v"),
            (F.row_number().over(w) - 1).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
        )
        h = (F.col("n") - 1).cast("double") * F.lit(0.5)
        r0 = F.floor(h)
        return (
            ranked.filter((F.col("rn") == r0) | (F.col("rn") == r0 + 1))
            .groupBy("event_type")
            .agg(
                F.min(F.when(F.col("rn") == F.floor((F.col("n") - 1).cast("double") * F.lit(0.5)), F.col("_v"))).alias("v0"),
                F.min(F.when(F.col("rn") == F.floor((F.col("n") - 1).cast("double") * F.lit(0.5)) + 1, F.col("_v"))).alias("v1"),
                F.min((F.col("n") - 1).cast("double") * F.lit(0.5) - F.floor((F.col("n") - 1).cast("double") * F.lit(0.5)).cast("double")).alias("frac"),
            )
            .select(
                "event_type",
                (F.col("v0") + F.col("frac") * (F.coalesce(F.col("v1"), F.col("v0")) - F.col("v0"))).alias("_m"),
            )
        )

    med = exact_median(ev, "value").withColumnRenamed("_m", "med")
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = exact_median(
        dev.select("event_type", "event_id", F.col("adev").alias("value")), "value"
    ).withColumnRenamed("_m", "mad")
    flagged = (
        dev.join(F.broadcast(mad), "event_type")
        .withColumn(
            "is_outlier",
            F.col("adev") > F.lit(3.0) * (F.col("mad") * F.lit(1.4826)),
        )
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.min("med"), 4).alias("median"),
            F.round(F.min("mad"), 4).alias("mad"),
            F.sum(F.when(F.col("is_outlier"), 1).otherwise(0)).cast("bigint").alias("n_outliers"),
        )
        .orderBy("event_type")
    )


_MED_SQL = """
  SELECT event_type,
         min(CASE WHEN rn = floor((n - 1)::DOUBLE * 0.5) THEN _v END)
           + min((n - 1)::DOUBLE * 0.5 - floor((n - 1)::DOUBLE * 0.5)::DOUBLE)
             * (coalesce(min(CASE WHEN rn = floor((n - 1)::DOUBLE * 0.5) + 1 THEN _v END),
                         min(CASE WHEN rn = floor((n - 1)::DOUBLE * 0.5) THEN _v END))
                - min(CASE WHEN rn = floor((n - 1)::DOUBLE * 0.5) THEN _v END)) AS _m
  FROM {src}
  WHERE rn = floor((n - 1)::DOUBLE * 0.5) OR rn = floor((n - 1)::DOUBLE * 0.5) + 1
  GROUP BY event_type
"""

ROBUST_OUTLIERS_SQL = f"""
WITH ranked1 AS (
  SELECT event_type, value AS _v,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) - 1 AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
), med AS (
{_MED_SQL.format(src="ranked1")}
), dev AS (
  SELECT e.event_type, e.event_id, abs(e.value - m._m) AS adev, m._m AS med
  FROM events e JOIN med m USING (event_type)
), ranked2 AS (
  SELECT event_type, adev AS _v,
         row_number() OVER (PARTITION BY event_type ORDER BY adev, event_id) - 1 AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM dev
), mad AS (
{_MED_SQL.format(src="ranked2")}
)
SELECT d.event_type,
       count(*)::BIGINT AS n,
       round(min(d.med), 4) AS median,
       round(min(md._m), 4) AS mad,
       sum(CASE WHEN d.adev > 3.0 * (md._m * 1.4826) THEN 1 ELSE 0 END)::BIGINT AS n_outliers
FROM dev d JOIN mad md USING (event_type)
GROUP BY d.event_type
"""


def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average value (TWAP): each event's value
    holds until the next event, weighted by that interval. Values are
    quantized to integer cents and intervals to integer µs BEFORE the
    sum, so the accumulation is exact bigint arithmetic
    (order-independent across engines/partitions); doubles appear only
    in the final single division. Events with no successor contribute
    no interval (lead is NULL), matching the oracle."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        (F.lead(F.unix_micros(F.col("ts"))).over(w) - F.unix_micros(F.col("ts"))).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return (
        t.groupBy("user_id")
        .agg(
            F.sum(F.col("cents") * F.col("dt_us")).alias("wsum"),
            F.sum("dt_us").alias("tsum"),
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        )
        .select(
            "user_id",
            "n_intervals",
            F.round(
                F.col("wsum").cast("double") / (F.lit(100.0) * F.col("tsum").cast("double")),
                4,
            ).alias("twap"),
        )
    )


TIME_WEIGHTED_AVG_SQL = """
WITH t AS (
  SELECT user_id,
         floor(value * 100 + 0.5)::BIGINT AS cents,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - epoch_us(ts) AS dt_us
  FROM events
)
SELECT user_id,
       count(*)::BIGINT AS n_intervals,
       round(sum(cents * dt_us)::DOUBLE / (100.0 * sum(dt_us)::DOUBLE), 4) AS twap
FROM t WHERE dt_us IS NOT NULL
GROUP BY user_id
"""


def value_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical CDF position of selected events within their type:
    percent_rank over a total (value, event_id) order — deterministic
    under ties, one grouped sort, no global order. The probe filter
    keeps the output small; at scale the same window computes every
    row's position in one pass."""
    ev = table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.withColumn("cdf", F.round(F.percent_rank().over(w), 6))
        .filter(F.col("event_id") % 101 == 0)
        .select("event_type", "event_id", "value", "cdf")
    )


VALUE_CDF_SQL = """
SELECT event_type, event_id, value, cdf FROM (
  SELECT event_type, event_id, value,
         round(percent_rank() OVER (
           PARTITION BY event_type ORDER BY value, event_id), 6) AS cdf
  FROM events
) WHERE event_id % 101 = 0
"""


def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS value trend (cents per hour) via EXACT integer
    moments — the closed-form least-squares slope computed the only
    way two engines can agree on it bit-for-bit.

    x = seconds since the user's own first event (recentring keeps
    every product within bigint range: x <= ~2.6e6 for a month,
    y cents <= ~1e7, n per user bounded), y = integer cents. The
    five sufficient statistics (n, Σx, Σy, Σxy, Σx²) are exact
    bigints — order-independent — and slope/intercept are single
    IEEE divisions at the end:
      slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²),
    reported as cents/hour (×3600), round 4. Users with < 3 events
    or a degenerate x-spread are filtered (both engines identically).
    Scale: one window for the per-user recentring, one
    map-side-combined agg — no driver math beyond the plan."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    x = (F.col("ts").cast("long") - F.min(F.col("ts").cast("long")).over(w)).cast(
        "bigint"
    )
    y = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    base = ev.select(F.col("user_id"), x.alias("x"), y.alias("y"))
    agg = base.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope_cph = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / denom.cast("double")
        * F.lit(3600.0)
    )
    return (
        agg.filter((F.col("n") >= 3) & (denom > 0))
        .select(
            "user_id",
            "n",
            F.round(slope_cph, 4).alias("slope_cents_per_hour"),
        )
    )


USER_VALUE_TREND_SQL = """
WITH base AS (
  SELECT user_id,
         ((epoch_us(ts) // 1000000) - min(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id)) AS x,
         floor(value * 100 + 0.5)::BIGINT AS y
  FROM events
), agg AS (
  SELECT user_id, count(*) AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx
  FROM base GROUP BY user_id
)
SELECT user_id, n::BIGINT AS n,
       round((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE * 3600.0,
             4) AS slope_cents_per_hour
FROM agg
WHERE n >= 3 AND (n * sxx - sx * sx) > 0
"""


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's
    event-type sequence (lag window, deterministic (ts, event_id)
    order) with the transition probability as ONE exact-integer
    division per row — the behavioral-model feature table."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        ev.withColumn("from_type", F.lag("event_type").over(w))
        .filter(F.col("from_type").isNotNull())
        .select("from_type", F.col("event_type").alias("to_type"))
    )
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(totals).cast("double"), 6
        ).alias("p"),
    )


EVENT_TRANSITIONS_SQL = """
WITH steps AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
), f AS (
  SELECT from_type, to_type FROM steps WHERE from_type IS NOT NULL
), counts AS (
  SELECT from_type, to_type, count(*) AS n FROM f GROUP BY from_type, to_type
)
SELECT from_type, to_type, n::BIGINT AS n,
       round(n::DOUBLE / sum(n) OVER (PARTITION BY from_type)::DOUBLE, 6) AS p
FROM counts
"""


def weighted_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median of value per event_type (weights
    synthesized as 1 + user_id % 3): sort by (value, event_id) for a
    deterministic tie order, running integer weight sums, first row
    whose doubled cumulative weight reaches the total — no floats
    until the reported value itself."""
    ev = table(spark, sf_dir, "events")
    wgt = (F.lit(1) + F.col("user_id") % 3).cast("bigint")
    base = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v_cents"),
        "event_id",
        wgt.alias("w"),
    )
    order = Window.partitionBy("event_type").orderBy("v_cents", "event_id")
    tot = Window.partitionBy("event_type")
    ranked = base.withColumn(
        "cumw", F.sum("w").over(order.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("totw", F.sum("w").over(tot))
    picked = ranked.filter(F.col("cumw") * 2 >= F.col("totw"))
    first = Window.partitionBy("event_type").orderBy("v_cents", "event_id")
    return (
        picked.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            (F.col("v_cents").cast("double") / 100.0).alias("weighted_median"),
            F.col("totw").alias("total_weight"),
        )
    )


WEIGHTED_PERCENTILES_SQL = """
WITH base AS (
  SELECT event_type,
         floor(value * 100 + 0.5)::BIGINT AS v_cents,
         event_id,
         (1 + user_id % 3)::BIGINT AS w
  FROM events
), ranked AS (
  SELECT event_type, v_cents, event_id, w,
         sum(w) OVER (PARTITION BY event_type ORDER BY v_cents, event_id
                      ROWS UNBOUNDED PRECEDING) AS cumw,
         sum(w) OVER (PARTITION BY event_type) AS totw
  FROM base
), picked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY v_cents, event_id) AS rn
  FROM ranked WHERE cumw * 2 >= totw
)
SELECT event_type,
       v_cents::DOUBLE / 100.0 AS weighted_median,
       totw::BIGINT AS total_weight
FROM picked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Gap-fill resampling (hypertable time_bucket_gapfill + locf): every
# tenth user's purchase series resampled to an hourly grid, missing
# hours carrying the last observation forward. Cents ride as bigints
# through the fill; ONE division at projection.
# ---------------------------------------------------------------------------


def gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import gap_fill_locf

    ev = table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 10 == 0)
    )
    obs = ev.select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        "event_id",
    )
    filled = gap_fill_locf(
        obs, "user_id", "t_us", "cents", 3_600_000_000, order_cols=("event_id",)
    )
    return filled.select(
        "user_id",
        "bucket",
        (F.col("cents").cast("double") / F.lit(100.0)).alias("value_filled"),
        "is_observed",
    )


GAP_FILL_HOURLY_SQL = """
WITH obs AS (
  SELECT user_id, epoch_us(ts::TIMESTAMP) // 3600000000 AS bucket,
         epoch_us(ts::TIMESTAMP) AS tus, event_id,
         floor(value * 100 + 0.5)::BIGINT AS cents
  FROM events WHERE event_type = 'purchase' AND user_id % 10 = 0
), pb AS (
  SELECT user_id, bucket, cents FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, bucket ORDER BY tus DESC, event_id DESC) AS rn
    FROM obs
  ) WHERE rn = 1
), span AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM obs GROUP BY user_id),
grid AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket FROM span),
f AS (
  SELECT g.user_id, g.bucket, pb.cents AS oc
  FROM grid g LEFT JOIN pb ON pb.user_id = g.user_id AND pb.bucket = g.bucket
)
SELECT user_id, bucket,
       (last_value(oc IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE / 100.0 AS value_filled,
       oc IS NOT NULL AS is_observed
FROM f
"""


# ---------------------------------------------------------------------------
# Winsorized statistics: clamp per-type values at the exact
# nearest-rank p05/p95 cutoffs (pure integer rank math — no
# interpolation, no floats until the final projections).
# ---------------------------------------------------------------------------


def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    ranked = ev.withColumn("rn", F.row_number().over(w) - 1).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    lo_r = F.expr("((n - 1) * 5) div 100")
    hi_r = F.expr("((n - 1) * 95) div 100")
    cuts = (
        ranked.filter((F.col("rn") == lo_r) | (F.col("rn") == hi_r))
        .groupBy("event_type")
        .agg(
            F.min(F.when(F.col("rn") == F.expr("((n - 1) * 5) div 100"), F.col("cents"))).alias("lo"),
            F.min(F.when(F.col("rn") == F.expr("((n - 1) * 95) div 100"), F.col("cents"))).alias("hi"),
        )
    )
    clamped = F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.min("lo").cast("double") / 100.0).alias("lo_cut"),
            (F.min("hi").cast("double") / 100.0).alias("hi_cut"),
            F.sum(F.when(F.col("cents") < F.col("lo"), 1).otherwise(0)).cast("bigint").alias("n_low"),
            F.sum(F.when(F.col("cents") > F.col("hi"), 1).otherwise(0)).cast("bigint").alias("n_high"),
            F.sum(clamped).cast("bigint").alias("wsum_cents"),
        )
        .select(
            "event_type",
            "n",
            "lo_cut",
            "hi_cut",
            "n_low",
            "n_high",
            (F.col("wsum_cents").cast("double") / 100.0).alias("wsum_value"),
            F.round((F.col("wsum_cents").cast("double") / 100.0) / F.col("n"), 4).alias(
                "wavg_value"
            ),
        )
    )


WINSORIZED_STATS_SQL = """
WITH ev AS (
  SELECT event_type, event_id, floor(value * 100 + 0.5)::BIGINT AS cents FROM events
), ranked AS (
  SELECT event_type, event_id, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) - 1 AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev
), cuts AS (
  SELECT event_type,
         min(CASE WHEN rn = ((n - 1) * 5) // 100 THEN cents END) AS lo,
         min(CASE WHEN rn = ((n - 1) * 95) // 100 THEN cents END) AS hi
  FROM ranked
  WHERE rn = ((n - 1) * 5) // 100 OR rn = ((n - 1) * 95) // 100
  GROUP BY event_type
)
SELECT e.event_type,
       count(*)::BIGINT AS n,
       (min(c.lo)::DOUBLE / 100.0) AS lo_cut,
       (min(c.hi)::DOUBLE / 100.0) AS hi_cut,
       sum(CASE WHEN e.cents < c.lo THEN 1 ELSE 0 END)::BIGINT AS n_low,
       sum(CASE WHEN e.cents > c.hi THEN 1 ELSE 0 END)::BIGINT AS n_high,
       (sum(least(greatest(e.cents, c.lo), c.hi))::BIGINT::DOUBLE / 100.0) AS wsum_value,
       round((sum(least(greatest(e.cents, c.lo), c.hi))::BIGINT::DOUBLE / 100.0) / count(*), 4) AS wavg_value
FROM ev e JOIN cuts c ON c.event_type = e.event_type
GROUP BY e.event_type
"""


# ---------------------------------------------------------------------------
# Multi-touch attribution: split each purchase's cents EQUALLY across
# the clicks in its 1-hour lookback, remainder to the most recent
# click — exact integer allocation, Σ allocations == purchase cents
# by construction (no cent ever lost to float division).
# ---------------------------------------------------------------------------


def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("tp"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("tc"),
    )
    j = p.join(c, "user_id").filter(
        (F.col("tc") <= F.col("tp")) & (F.col("tp") - F.col("tc") <= 3_600_000_000)
    )
    w_n = Window.partitionBy("purchase_id")
    w_r = Window.partitionBy("purchase_id").orderBy(
        F.col("tc").desc(), F.col("click_id").desc()
    )
    alloc = F.expr("cents div n") + F.when(
        F.col("rn") == 1, F.expr("cents % n")
    ).otherwise(F.lit(0))
    return (
        j.withColumn("n", F.count(F.lit(1)).over(w_n))
        .withColumn("rn", F.row_number().over(w_r))
        .select(
            "purchase_id",
            "click_id",
            alloc.cast("bigint").alias("alloc_cents"),
            (alloc.cast("double") / F.lit(100.0)).alias("alloc_value"),
        )
    )


MULTI_TOUCH_ATTRIBUTION_SQL = """
WITH p AS (
  SELECT user_id, event_id AS purchase_id, epoch_us(ts::TIMESTAMP) AS tp,
         floor(value * 100 + 0.5)::BIGINT AS cents
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, epoch_us(ts::TIMESTAMP) AS tc
  FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.purchase_id, p.cents, c.click_id, c.tc
  FROM p JOIN c ON c.user_id = p.user_id
   AND c.tc <= p.tp AND p.tp - c.tc <= 3600000000
), r AS (
  SELECT *, count(*) OVER (PARTITION BY purchase_id) AS n,
         row_number() OVER (PARTITION BY purchase_id ORDER BY tc DESC, click_id DESC) AS rn
  FROM j
)
SELECT purchase_id, click_id,
       (cents // n + CASE WHEN rn = 1 THEN cents % n ELSE 0 END)::BIGINT AS alloc_cents,
       ((cents // n + CASE WHEN rn = 1 THEN cents % n ELSE 0 END)::DOUBLE) / 100.0 AS alloc_value
FROM r
"""


# ---------------------------------------------------------------------------
# Trailing event-time window (RANGE frame): per event, the user's
# running 24h-lookback sum/count — the window shape tumbling/sliding
# buckets cannot express (every row gets ITS OWN trailing horizon).
# Integer-µs RANGE bounds + integer cents keep it engine-exact.
# ---------------------------------------------------------------------------


def trailing_window_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    base = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t_us"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    day_us = 86_400_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(-day_us, Window.currentRow)
    )
    return base.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_24h"),
        (F.sum("cents").over(w).cast("double") / F.lit(100.0)).alias("sum_24h"),
    )


TRAILING_WINDOW_SUMS_SQL = """
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS t_us,
         floor(value * 100 + 0.5)::BIGINT AS cents
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id, event_id,
       count(*) OVER w ::BIGINT AS n_24h,
       (sum(cents) OVER w)::BIGINT::DOUBLE / 100.0 AS sum_24h
FROM base
WINDOW w AS (PARTITION BY user_id ORDER BY t_us
             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# Unpivot (melt): the inverse of user_event_matrix — wide per-user
# count columns back to (user_id, event_type, n) rows, dropping
# zero cells so pivot∘unpivot round-trips to the sparse form.
# ---------------------------------------------------------------------------


def event_matrix_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = user_event_matrix(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        wide.unpivot("user_id", types, "event_type", "n")
        .filter(F.col("n") > 0)
    )


EVENT_MATRIX_UNPIVOT_SQL = f"""
WITH wide AS ({USER_EVENT_MATRIX_SQL})
SELECT user_id, event_type, n
FROM (
  UNPIVOT wide ON click, error, purchase, signup, view
  INTO NAME event_type VALUE n
)
WHERE n > 0
"""


# ---------------------------------------------------------------------------
# Right-to-be-forgotten purge: given a deletion list, drop every
# event of those users and report a per-user audit count — the
# cascade a privacy pipeline runs across fact tables. The oracle is
# the from-scratch anti-join + audit.
# ---------------------------------------------------------------------------


def user_purge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    to_forget = ev.select("user_id").distinct().filter(F.col("user_id") % 13 == 0)
    purged = ev.join(F.broadcast(to_forget), "user_id", "left_anti")
    audit = (
        ev.join(F.broadcast(to_forget), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_deleted"))
    )
    survivors = purged.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return audit.crossJoin(F.broadcast(survivors)).select(
        "user_id", "n_deleted", F.col("n").alias("n_surviving_total")
    )


USER_PURGE_AUDIT_SQL = """
WITH forget AS (SELECT DISTINCT user_id FROM events WHERE user_id % 13 = 0),
audit AS (
  SELECT user_id, count(*)::BIGINT AS n_deleted
  FROM events WHERE user_id IN (SELECT user_id FROM forget)
  GROUP BY user_id
),
surv AS (
  SELECT count(*)::BIGINT AS n FROM events
  WHERE user_id NOT IN (SELECT user_id FROM forget)
)
SELECT user_id, n_deleted, n AS n_surviving_total
FROM audit, surv
"""


# ---------------------------------------------------------------------------
# Join-key skew report: the diagnosis every big join needs before it
# ships — per-key-distribution summary (n keys, rows, max key share,
# exact p99 key count) for a candidate join key. All integer until
# the final ratios.
# ---------------------------------------------------------------------------


def skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("cnt", "l_partkey")
    ranked = per_key.withColumn("rn", F.row_number().over(w)).withColumn(
        "nk", F.count(F.lit(1)).over(Window.partitionBy())
    )
    p99 = ranked.filter(F.col("rn") == F.expr("((nk - 1) * 99) div 100 + 1")).select(
        F.col("cnt").alias("p99_cnt")
    )
    agg = per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
    )
    return agg.crossJoin(F.broadcast(p99)).select(
        "n_keys",
        "n_rows",
        "max_cnt",
        "p99_cnt",
        F.round(
            F.col("max_cnt").cast("double")
            / (F.col("n_rows").cast("double") / F.col("n_keys").cast("double")),
            4,
        ).alias("skew_factor"),
    )


SKEW_REPORT_SQL = """
WITH per_key AS (
  SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt, l_partkey) AS rn,
         count(*) OVER () AS nk
  FROM per_key
), p99 AS (
  SELECT cnt AS p99_cnt FROM ranked WHERE rn = ((nk - 1) * 99) // 100 + 1
), agg AS (
  SELECT count(*)::BIGINT AS n_keys, sum(cnt)::BIGINT AS n_rows, max(cnt)::BIGINT AS max_cnt
  FROM per_key
)
SELECT n_keys, n_rows, max_cnt, p99_cnt,
       round(max_cnt::DOUBLE / (n_rows::DOUBLE / n_keys::DOUBLE), 4) AS skew_factor
FROM agg, p99
"""


# ---------------------------------------------------------------------------
# Event co-occurrence lift: for each ordered pair of event types, how
# often they occur within 5 minutes for the same user vs what
# independence predicts (the association-rule lift over a temporal
# basket). Counts are exact integers; lift is one final division
# chain spelled identically in the oracle.
# ---------------------------------------------------------------------------


def event_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("t_us"),
    )
    a = ev.select(
        "user_id",
        F.col("event_type").alias("type_a"),
        F.col("event_id").alias("_ida"),
        F.col("t_us").alias("_ta"),
    )
    b = ev.select(
        "user_id",
        F.col("event_type").alias("type_b"),
        F.col("event_id").alias("_idb"),
        F.col("t_us").alias("_tb"),
    )
    window_us = 300_000_000
    pairs = (
        a.join(b, "user_id")
        .filter(
            (F.col("_idb") != F.col("_ida"))
            & (F.col("_tb") >= F.col("_ta"))
            & (F.col("_tb") - F.col("_ta") <= window_us)
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_cooc"))
    )
    totals = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    n_all = ev.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    return (
        pairs.join(
            F.broadcast(totals.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(totals.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))),
            "type_b",
        )
        .crossJoin(F.broadcast(n_all))
        .select(
            "type_a",
            "type_b",
            "n_cooc",
            "n_a",
            "n_b",
            F.round(
                (F.col("n_cooc").cast("double") * F.col("n_total").cast("double"))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                6,
            ).alias("lift"),
        )
    )


EVENT_COOCCURRENCE_SQL = """
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_us(ts::TIMESTAMP) AS t_us FROM events
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*)::BIGINT AS n_cooc
  FROM ev a JOIN ev b ON b.user_id = a.user_id
   AND b.event_id <> a.event_id
   AND b.t_us >= a.t_us AND b.t_us - a.t_us <= 300000000
  GROUP BY a.event_type, b.event_type
), totals AS (
  SELECT event_type, count(*)::BIGINT AS n FROM ev GROUP BY event_type
), alln AS (SELECT count(*)::BIGINT AS n_total FROM ev)
SELECT p.type_a, p.type_b, p.n_cooc, ta.n AS n_a, tb.n AS n_b,
       round((p.n_cooc::DOUBLE * n_total::DOUBLE) / (ta.n::DOUBLE * tb.n::DOUBLE), 6) AS lift
FROM pairs p
JOIN totals ta ON ta.event_type = p.type_a
JOIN totals tb ON tb.event_type = p.type_b
CROSS JOIN alln
"""


def events_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join — the warehouse temporal pattern on
    top of the SCD2 interval builder: every third event per user
    plays a dimension observation (its validity runs to the user's
    next observation, open-ended for the last), and the remaining
    events are facts joined to the version valid AT fact time
    (half-open [from, to), so boundary facts land in exactly one
    version; facts before a user's first version drop — inner PIT).

    Plan shape: the dim intervals are one per-user window; the PIT
    join is an EQUI-join on user_id with range residuals, so it
    plans as a sort-merge join on the user key, never a nested-loop
    — at 100 TB this is the partition-friendly spelling (both sides
    shuffle once on user_id)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    dim0 = ev.filter(F.col("event_id") % 3 == 0)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    dim = dim0.select(
        "user_id",
        F.col("event_type").alias("version_type"),
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w).alias("valid_to_us"),
    )
    fact = ev.filter(F.col("event_id") % 3 != 0).select(
        "user_id", F.col("event_id").alias("fact_id"), F.col("ts_us").alias("fact_ts_us")
    )
    return fact.join(
        dim,
        (fact["user_id"] == dim["user_id"])
        & (dim["valid_from_us"] <= fact["fact_ts_us"])
        & (dim["valid_to_us"].isNull() | (fact["fact_ts_us"] < dim["valid_to_us"])),
    ).select(
        fact["user_id"],
        "fact_id",
        "fact_ts_us",
        "version_type",
        "valid_from_us",
    )


EVENTS_PIT_JOIN_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
), dim AS (
  SELECT user_id, event_type AS version_type,
         ts_us AS valid_from_us,
         lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           AS valid_to_us
  FROM ev WHERE event_id % 3 = 0
), fact AS (
  SELECT user_id, event_id AS fact_id, ts_us AS fact_ts_us
  FROM ev WHERE event_id % 3 <> 0
)
SELECT f.user_id, f.fact_id, f.fact_ts_us, d.version_type, d.valid_from_us
FROM fact f JOIN dim d
  ON f.user_id = d.user_id
 AND d.valid_from_us <= f.fact_ts_us
 AND (d.valid_to_us IS NULL OR f.fact_ts_us < d.valid_to_us)
"""


def merged_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable two-level quantile summary over event values
    (operators/sketches.py::merged_quantile_summary): 16 shards x 32
    summary rows answer the 10/25/50/75/90th percentiles with rank
    error <= N/32 per shard, corpus touched by one shard-keyed
    window only."""
    from ..operators.sketches import merged_quantile_summary

    ev = table(spark, sf_dir, "events").select("event_id", "value")
    return merged_quantile_summary(ev, "value", "event_id")


MERGED_QUANTILES_SQL = """
WITH base AS (
  SELECT value AS val, event_id AS rid,
         (('0x' || substr(md5('qsum:' || event_id::VARCHAR), 1, 15))::BIGINT % 16)::INTEGER AS shard
  FROM events
), ranked AS (
  SELECT val, rid, shard,
         row_number() OVER (PARTITION BY shard ORDER BY val, rid)::BIGINT AS rn,
         count(*) OVER (PARTITION BY shard)::BIGINT AS n
  FROM base
), sel AS (
  SELECT * FROM ranked WHERE (rn * 32) // n > ((rn - 1) * 32) // n
), summary AS (
  SELECT val, shard, rn,
         (rn - coalesce(lag(rn) OVER (PARTITION BY shard ORDER BY rn), 0))::BIGINT AS w
  FROM sel
), cum AS (
  SELECT val, shard, rn,
         sum(w) OVER (ORDER BY val, shard, rn)::BIGINT AS cum
  FROM summary
), tot AS (SELECT count(*)::BIGINT AS n FROM base),
targets AS (
  SELECT q::BIGINT AS q_pct, ((q * t.n + 99) // 100)::BIGINT AS target_rank
  FROM (SELECT unnest([10, 25, 50, 75, 90]) AS q), tot t
)
SELECT t.q_pct, t.target_rank, min_by(c.val, c.cum) AS approx_value
FROM cum c, targets t
WHERE c.cum >= t.target_rank
GROUP BY t.q_pct, t.target_rank
"""


def ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B experiment report (operators/sampling.py::
    ab_assignment_report): users hash into a 40%-exposure experiment
    with 2 arms + holdout; per-arm unit/event counts and exact
    integer metric means."""
    from ..operators.sampling import ab_assignment_report

    ev = table(spark, sf_dir, "events").select("user_id", "value")
    return ab_assignment_report(ev, arms=2, exposure_bp=4000, salt="exp1")


AB_TEST_REPORT_SQL = """
WITH base AS (
  SELECT CASE WHEN (('0x' || substr(md5('exp1:' || user_id::VARCHAR), 1, 15))::BIGINT % 10000) * 10000 < 4000 * 10000
              THEN ('0x' || substr(md5('exp1:' || user_id::VARCHAR), 1, 15))::BIGINT % 10000 % 2
              ELSE -1 END AS arm,
         user_id AS unit,
         round(value * 100)::BIGINT AS cents
  FROM events
), agg AS (
  SELECT arm::BIGINT AS arm,
         count(DISTINCT unit)::BIGINT AS n_units,
         count(*)::BIGINT AS n_events,
         sum(cents)::BIGINT AS sum_cents
  FROM base GROUP BY 1
)
SELECT arm, n_units, n_events, sum_cents,
       ((2 * sum_cents * 100 + n_events) // (2 * n_events))::BIGINT AS mean_centi_cents
FROM agg
"""


def engagement_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DAU/WAU stickiness per day — the product-analytics
    staple, spelled exactly (no HLL): days are integer epoch-day
    numbers (µs div 86400e6 — engine-exact), each active (day, user)
    contributes to the 7 trailing WAU windows via a bounded explode,
    and both counts are distinct-user aggregates. Stickiness in
    integer basis points.

    Scale: the explode multiplies DISTINCT user-days by 7 (not raw
    events); both counts are two-phase distinct aggs on day keys —
    no window over users, no self-join on the event table."""
    ev = table(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) div 86400000000").alias("day_n"),
        "user_id",
    )
    user_days = ev.distinct()
    dau = user_days.groupBy("day_n").agg(
        F.count_distinct("user_id").cast("bigint").alias("dau")
    )
    wau = (
        user_days.select(
            F.explode(F.sequence(F.col("day_n"), F.col("day_n") + 6)).alias("day_n"),
            "user_id",
        )
        .groupBy("day_n")
        .agg(F.count_distinct("user_id").cast("bigint").alias("wau"))
    )
    return (
        dau.join(wau, "day_n")
        .withColumn("stickiness_bp", F.expr("(10000 * dau) div wau"))
        .select("day_n", "dau", "wau", "stickiness_bp")
    )


ENGAGEMENT_RATIOS_SQL = """
WITH ud AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day_n, user_id FROM events
), dau AS (
  SELECT day_n, count(DISTINCT user_id)::BIGINT AS dau FROM ud GROUP BY 1
), contrib AS (
  SELECT day_n + o AS day_n, user_id
  FROM ud, unnest(range(0, 7)) AS t(o)
), wau AS (
  SELECT day_n, count(DISTINCT user_id)::BIGINT AS wau FROM contrib GROUP BY 1
)
SELECT d.day_n::BIGINT AS day_n, d.dau, w.wau,
       ((10000 * d.dau) // w.wau)::BIGINT AS stickiness_bp
FROM dau d JOIN wau w USING (day_n)
"""


def frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-itemset pairs (the a-priori first pass / market-
    basket capability): baskets are users, items their DISTINCT
    event types; output every type pair with support ≥ 5 baskets,
    its per-item supports, and integer-ppm lift
    (1e6·n_ab·N div (n_a·n_b)).

    Scale: the pair explode runs per user over the DISTINCT item set
    — C(items_u, 2) with items bounded by the type vocabulary, never
    C(events, 2); supports are map-side-combinable counts and the
    item-support joins broadcast (vocabulary-sized)."""
    ui = (
        table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    a = ui.select("user_id", F.col("event_type").alias("type_a"))
    b = ui.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    supp = ui.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    n_users = ui.select("user_id").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_baskets")
    )
    return (
        pairs.join(
            F.broadcast(supp.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(supp.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))),
            "type_b",
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            "n_a",
            "n_b",
            "n_baskets",
            F.expr("(1000000 * n_ab * n_baskets) div (n_a * n_b)").alias("lift_ppm"),
        )
    )


FREQUENT_PAIRS_SQL = """
WITH ui AS (
  SELECT DISTINCT user_id, event_type FROM events
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*)::BIGINT AS n_ab
  FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
  HAVING count(*) >= 5
), supp AS (
  SELECT event_type, count(*)::BIGINT AS n FROM ui GROUP BY 1
), nb AS (SELECT count(DISTINCT user_id)::BIGINT AS n_baskets FROM ui)
SELECT p.type_a, p.type_b, p.n_ab, sa.n AS n_a, sb.n AS n_b, nb.n_baskets,
       ((1000000 * p.n_ab * nb.n_baskets) // (sa.n * sb.n))::BIGINT AS lift_ppm
FROM pairs p
JOIN supp sa ON sa.event_type = p.type_a
JOIN supp sb ON sb.event_type = p.type_b
CROSS JOIN nb
"""


def ingestion_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Islands-and-gaps over the event_id keyspace — the ingestion
    QA that answers "did we drop a batch?": contiguous id runs
    collapse to one island row via the id − dense-rank grouping
    trick; every 1000th id is deleted first so there ARE gaps to
    find. Output per island: start, end, length, and the gap to the
    next island (NULL on the last).

    Scale: one distributed range sort (the global rank) + one
    island-keyed groupBy; no self-join, no window over the whole
    table beyond the rank."""
    from ..operators.rank import global_rank

    ev = (
        table(spark, sf_dir, "events")
        .select("event_id")
        .filter(F.col("event_id") % 1000 != 0)
        .distinct()
    )
    ranked = global_rank(ev, ["event_id"], out_col="rn")
    islands = (
        ranked.withColumn("grp", F.col("event_id") - F.col("rn"))
        .groupBy("grp")
        .agg(
            F.min("event_id").alias("island_start"),
            F.max("event_id").alias("island_end"),
            F.count(F.lit(1)).cast("bigint").alias("island_len"),
        )
    )
    w = Window.orderBy("island_start")
    return islands.select(
        "island_start",
        "island_end",
        "island_len",
        (F.lead("island_start").over(w) - F.col("island_end") - 1)
        .cast("bigint")
        .alias("gap_to_next"),
    )


INGESTION_ISLANDS_SQL = """
WITH ev AS (
  SELECT DISTINCT event_id FROM events WHERE event_id % 1000 <> 0
), ranked AS (
  SELECT event_id, row_number() OVER (ORDER BY event_id)::BIGINT AS rn FROM ev
), islands AS (
  SELECT min(event_id) AS island_start, max(event_id) AS island_end,
         count(*)::BIGINT AS island_len
  FROM ranked GROUP BY event_id - rn
)
SELECT island_start, island_end, island_len,
       (lead(island_start) OVER (ORDER BY island_start) - island_end - 1)::BIGINT
         AS gap_to_next
FROM islands
"""


def type_bitmap_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types via presence bitmaps
    (operators/sketches.py::bitmap_overlap): 1024-bit linear-counting
    bitmaps over the user space, popcount(AND) pairwise overlap,
    bucket-space Jaccard in bp."""
    from ..operators.sketches import bitmap_overlap

    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    return bitmap_overlap(ev, "event_type", "user_id")


TYPE_BITMAP_OVERLAP_SQL = """
WITH ui AS (
  SELECT DISTINCT event_type AS grp, user_id AS id FROM events
), bucketed AS (
  SELECT grp,
         (('0x' || substr(md5('bm:' || id::VARCHAR), 1, 15))::BIGINT % 1024) AS b
  FROM ui
), base AS (
  SELECT grp, b // 63 AS word, (1::BIGINT << (b % 63)::INTEGER) AS bit
  FROM bucketed
), wmaps AS (
  SELECT grp, word, bit_or(bit) AS w FROM base GROUP BY 1, 2
), common AS (
  SELECT a.grp AS grp_a, c.grp AS grp_b,
         sum(bit_count(a.w & c.w))::BIGINT AS common_buckets
  FROM wmaps a JOIN wmaps c ON a.word = c.word AND a.grp < c.grp
  GROUP BY 1, 2
), sizes AS (
  SELECT grp, sum(bit_count(w))::BIGINT AS n_buckets FROM wmaps GROUP BY 1
)
SELECT x.grp_a, x.grp_b, sa.n_buckets AS buckets_a, sb.n_buckets AS buckets_b,
       x.common_buckets,
       ((10000 * x.common_buckets)
         // (sa.n_buckets + sb.n_buckets - x.common_buckets))::BIGINT AS jaccard_bp
FROM common x
JOIN sizes sa ON sa.grp = x.grp_a
JOIN sizes sb ON sb.grp = x.grp_b
"""
