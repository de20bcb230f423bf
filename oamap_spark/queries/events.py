"""Event-stream analytics (batch form) on the `events` table.

The reference is batch-only (SURVEY §1.4); these queries cover the
stream-shaped capabilities (sessionization, funnels, time-windowed
rollups) as deterministic batch queries. Their Structured Streaming
twins live in oamap_spark/streaming/ (rows-only checks — the driver's
oracle can't run a stream).

All event-time arithmetic is µs (DuckDB sees parquet ns as µs
TIMESTAMP — see sources/tables.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oamap_spark.queries.registry import register
from oamap_spark.sources.tables import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


@register(
    "sessionize_events",
    tags=("events", "window", "sessionization"),
    bench=True,
    oracle=f"""
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS t,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
), sess AS (
  SELECT user_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY t
                           ROWS UNBOUNDED PRECEDING) AS session_id,
         t
  FROM seq
)
SELECT user_id,
       count(DISTINCT session_id)    AS n_sessions,
       count(*)                      AS n_events,
       CAST(max(t) - min(t) AS BIGINT) AS span_us
FROM sess
GROUP BY user_id
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → new-session
    flag → running sum = session id. One shuffle on user_id; both
    window passes reuse the same partitioning (no second exchange)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    wrun = Window.partitionBy("user_id").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    seq = ev.select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        "event_id",
    ).withColumn(
        "is_new",
        F.when(
            F.col("t") - F.lag("t").over(w) > SESSION_GAP_US, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    sess = seq.withColumn("session_id", F.sum("is_new").over(wrun))
    return sess.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max("t") - F.min("t")).alias("span_us"),
    )


@register(
    "tumbling_window_rollup",
    tags=("events", "time_window"),
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY 1, 2
""",
)
def tumbling_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily tumbling-window rollup per event type — the batch image of
    a streaming windowed aggregation (streaming twin uses F.window)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("value_cents"),
        )
    )


@register(
    "funnel_view_to_purchase",
    tags=("events", "funnel", "window"),
    oracle="""
WITH flags AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS saw,
         max(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS clicked,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS bought
  FROM events GROUP BY user_id
)
SELECT CAST(sum(saw) AS BIGINT)     AS n_view,
       CAST(sum(clicked) AS BIGINT) AS n_click,
       CAST(sum(bought) AS BIGINT)  AS n_purchase,
       CAST(sum(CASE WHEN saw=1 AND clicked=1 AND bought=1 THEN 1 ELSE 0 END) AS BIGINT)
                                    AS n_full_funnel
FROM flags
""",
)
def funnel_view_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: per-user presence flags then global counts —
    two partial-aggregated hash aggs, no window needed."""
    ev = load_table(spark, sf_dir, "events")
    flags = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("saw"),
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("clicked"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("bought"),
    )
    return flags.agg(
        F.sum("saw").alias("n_view"),
        F.sum("clicked").alias("n_click"),
        F.sum("bought").alias("n_purchase"),
        F.sum(
            F.when(
                (F.col("saw") == 1) & (F.col("clicked") == 1) & (F.col("bought") == 1), 1
            ).otherwise(0)
        ).alias("n_full_funnel"),
    )


@register(
    "event_type_transitions",
    tags=("events", "window", "lag"),
    oracle="""
SELECT prev_type, event_type AS next_type, count(*) AS n
FROM (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
WHERE prev_type IS NOT NULL
GROUP BY 1, 2
""",
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-style transition counts between consecutive event types
    per user — lag + group, single shuffle reused by both."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "retention_cohorts",
    tags=("events", "cohort", "retention"),
    oracle="""
WITH f AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
), a AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events
)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day, a.day) AS INT) AS day_offset,
       CAST(count(*) AS BIGINT) AS active_users
FROM a JOIN f USING (user_id)
GROUP BY 1, 2
""",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by their first-activity day,
    counted on each later day-offset they return. Both the first-day
    agg and the activity dedup shuffle on user_id, so AQE plans the
    equi-join shuffle-free on the reused partitioning; the final
    (cohort_day, offset) agg is the only additional exchange. No
    windows, no skew (user_id is high-cardinality uniform)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    first = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    active = ev.select("user_id", day.alias("day")).distinct()
    return (
        active.join(first, "user_id")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").alias("day_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("active_users"))
    )


@register(
    "sliding_window_counts",
    tags=("events", "window", "sliding"),
    oracle="""
SELECT ws AS window_start, event_type,
       CAST(count(*) AS BIGINT) AS n
FROM events,
     UNNEST([date_trunc('day', ts), date_trunc('day', ts) - INTERVAL 1 DAY])
       AS u(ws)
GROUP BY 1, 2
""",
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 2-day windows advancing 1 day, so
    every event belongs to exactly two windows. F.window handles the
    multi-assignment natively (one generator, no self-join); the same
    expression runs unchanged under readStream with a watermark. The
    oracle unnests each event into its two window starts — identical
    grouping, different plan."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 days", "1 day").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.col("w.start").cast("timestamp").alias("window_start"),
            "event_type",
            "n",
        )
    )


@register(
    "latest_event_per_user",
    tags=("events", "window", "qualify", "dedup-latest"),
    oracle="""
SELECT user_id, event_id, event_type, ts
FROM (
  SELECT user_id, event_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY-style latest-record dedup: exactly one row per user —
    the newest event, ties broken by event_id so the winner is
    deterministic. rn=1 triggers the WindowGroupLimit rewrite (each
    partition pre-prunes to its per-key max before the shuffle), the
    shape every CDC/SCD ingest uses to compact updates at scale."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.select("user_id", "event_id", "event_type", "ts")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "events_week_hour_profile",
    tags=("events", "datetime", "profile"),
    oracle="""
SELECT CAST(date_part('dow', ts) AS INT) AS dow,
       CAST(date_part('hour', ts) AS INT) AS hr,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def events_week_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity heatmap. Engine dow conventions
    differ (Spark dayofweek: Sunday=1; DuckDB dow: Sunday=0) — the
    query pins Sunday=0 on both sides explicitly, the kind of calendar
    off-by-one that silently corrupts weekly seasonality features."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
