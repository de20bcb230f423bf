"""Structured Streaming declared queries (SURVEY §7.7 extension).

Each callable builds an incremental plan over the events file stream,
drains it with trigger(availableNow) into a memory sink, and returns
the sink as a batch DataFrame — so the driver's DuckDB oracle gates
streaming semantics too (window assignment, stateful dedup, session
merge), not just row counts. Windowed/session aggregations run in
APPEND mode — each window emits exactly once when the watermark
finalizes it and its state is evicted, so the identical plans run
continuously on an unbounded source; their oracles clip to the same
finalization line (max event time − watermark delay). The two
complete-mode queries that remain (stream-static enrich, latest-per-
user) retain state by design and document their bounded-keyspace
assumption (25 group keys; one struct per distinct user)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oamap_spark.queries.registry import register
from oamap_spark.streaming import pipelines as P

SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "stream_tumbling_daily_counts",
    tags=("streaming", "window", "watermark", "append"),
    oracle="""
SELECT * FROM (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         event_type,
         count(*) AS n,
         round(sum(value), 2) AS sum_value
  FROM events
  GROUP BY 1, 2
)
WHERE day + INTERVAL 1 DAY <= (SELECT max(ts) - INTERVAL 1 DAY FROM events)
""",
)
def stream_tumbling_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming 1-day tumbling windows per event_type, APPEND mode —
    the unbounded-source-safe form: a window emits exactly once, when
    the watermark finalizes it (window_end ≤ max event time − 1-day
    delay), and its state is evicted; nothing is retained forever. The
    oracle is the batch date_trunc image clipped to the same
    finalization line — the two still-open trailing windows of a
    bounded replay stay in state, exactly what a restart resumes
    with."""
    ev = P.read_events_stream(spark, sf_dir)
    sink = P.drain_to_memory(
        P.tumbling_counts(ev), output_mode="append", spark=spark
    )
    return sink.select("day", "event_type", "n", "sum_value")


@register(
    "stream_distinct_user_event_keys",
    tags=("streaming", "dedup", "state"),
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_distinct_user_event_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup (first-seen wins, one state entry per
    key), append mode. Only the keys are emitted, so which duplicate
    arrived first is irrelevant to the oracle."""
    ev = P.read_events_stream(spark, sf_dir)
    return P.drain_to_memory(
        P.streaming_distinct_keys(ev), output_mode="append", spark=spark
    )


@register(
    "stream_stateful_user_counts",
    tags=("streaming", "state", "apply_in_pandas_with_state"),
    oracle="SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id",
)
def stream_stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState GroupState
    harness): per-user running event counts. A bounded availableNow
    replay emits each key's final total exactly once, so the batch
    groupBy-count oracle gates the state machine end-to-end."""
    from oamap_spark.streaming.stateful import running_user_counts

    ev = P.read_events_stream(spark, sf_dir)
    return P.drain_to_memory(
        running_user_counts(ev), output_mode="update", spark=spark
    )


@register(
    "stream_user_sessions",
    tags=("streaming", "session_window", "watermark", "append"),
    oracle=f"""
WITH seq AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
), sess AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM seq
), per AS (
  SELECT user_id, sid, count(*) AS n_events, max(ts) AS last_ts
  FROM sess
  GROUP BY user_id, sid
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM per
WHERE last_ts + INTERVAL 30 MINUTE <= (SELECT max(ts) - INTERVAL 1 DAY FROM events)
GROUP BY user_id
""",
)
def stream_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session_window (30-min gap) per user in APPEND mode —
    a session emits exactly once, when the watermark passes its end
    (last event + gap ≤ max event time − 1-day delay) and its state is
    evicted; safe on an unbounded source. Rolled up batch-side after
    the drain (one stateful agg per streaming query). Oracle:
    lag-islands with `>= gap` (session_window starts a new session
    when the inter-event gap reaches the gap exactly), clipped to
    sessions the final watermark finalized — trailing sessions stay in
    state, exactly what a restart resumes with."""
    ev = P.read_events_stream(spark, sf_dir)
    sessions = P.drain_to_memory(
        P.user_sessions(ev, gap="30 minutes"), output_mode="append", spark=spark
    )
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )


@register(
    "stream_static_enrich_counts",
    tags=("streaming", "stream_static_join", "broadcast"),
    oracle="""
SELECT c.c_mktsegment, e.event_type, count(*) AS n
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""",
)
def stream_static_enrich_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the events stream enriched per micro-batch
    with the (broadcast) customer dimension, then counted per
    (segment, event_type). The static side re-plans each micro-batch —
    dim refreshes flow in without restarting the stream. Complete
    output mode is safe here because the keyspace is BOUNDED by
    construction (|segments| × |event_types| ≈ 25 rows of state, not
    per-event state); for unbounded keys use the append-mode windowed
    queries instead."""
    from oamap_spark.sources.tables import load_table

    ev = P.read_events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = P.enrich_with_dim(
        ev, cust, ev.user_id == cust.c_custkey
    ).groupBy("c_mktsegment", "event_type").agg(F.count(F.lit(1)).alias("n"))
    return P.drain_to_memory(enriched, output_mode="complete", spark=spark)


@register(
    "stream_dedup_within_watermark",
    tags=("streaming", "dedup", "watermark", "state"),
    oracle="SELECT event_id, user_id, event_type FROM events",
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded streaming dedup: the stream is self-unioned (every
    event arrives exactly twice) and dropDuplicatesWithinWatermark
    suppresses the duplicate — state for a key lives only until the
    1-hour watermark passes its event time, unlike plain
    dropDuplicates' unbounded state. The oracle is the original
    (duplicate-free) events relation: exactly-once emission is the
    whole contract."""
    ev = P.read_events_stream(spark, sf_dir)
    doubled = ev.union(ev)
    deduped = P.dedup_within_watermark(doubled, ["event_id"], delay="1 hour")
    sink = P.drain_to_memory(deduped, output_mode="append", spark=spark)
    return sink.select("event_id", "user_id", "event_type")


@register(
    "stream_stream_view_purchase_join",
    tags=("streaming", "stream_stream_join", "interval"),
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type,
         make_timestamp(epoch_ns(ts) // 1000) AS tsu
  FROM events
)
SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
       epoch_us(p.tsu) - epoch_us(v.tsu) AS gap_us
FROM e v JOIN e p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.tsu >= v.tsu AND p.tsu <= v.tsu + INTERVAL 1 HOUR
""",
)
def stream_stream_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval self-join (views ⋈ purchases ≤1h later,
    same user), append mode, watermarks on both sides bounding state.
    The oracle is the identical batch interval join on µs-normalized
    timestamps."""
    ev = P.read_events_stream(spark, sf_dir)
    return P.drain_to_memory(
        P.view_purchase_interval_join(ev), output_mode="append", spark=spark
    )


@register(
    "stream_stream_left_outer_join",
    tags=("streaming", "stream_stream_join", "outer", "watermark"),
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type,
         make_timestamp(epoch_ns(ts) // 1000) AS tsu
  FROM events
),
mx AS (SELECT max(tsu) AS m FROM e),
matched AS (
  SELECT v.event_id AS view_id, v.user_id, p.event_id AS purchase_id
  FROM e v JOIN e p
    ON v.user_id = p.user_id
   AND v.event_type = 'view' AND p.event_type = 'purchase'
   AND p.tsu >= v.tsu AND p.tsu <= v.tsu + INTERVAL 1 HOUR
),
finalized_unmatched AS (
  SELECT v.event_id AS view_id, v.user_id, CAST(NULL AS BIGINT) AS purchase_id
  FROM e v, mx
  WHERE v.event_type = 'view'
    AND v.tsu + INTERVAL 1 HOUR < mx.m - INTERVAL 1 DAY
    AND NOT EXISTS (
      SELECT 1 FROM e p
      WHERE p.event_type = 'purchase' AND p.user_id = v.user_id
        AND p.tsu >= v.tsu AND p.tsu <= v.tsu + INTERVAL 1 HOUR
    )
)
SELECT * FROM matched UNION ALL SELECT * FROM finalized_unmatched
""",
)
def stream_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: null matches emit only
    when the watermark FINALIZES them (no qualifying purchase can
    still arrive). The oracle encodes the bounded-replay emission
    contract explicitly — matched pairs unconditionally, unmatched
    views only up to the final watermark line (max event time − 1 day
    delay − 1 h join bound); younger views stay in state, exactly
    what a restarted continuous run would resume with."""
    ev = P.read_events_stream(spark, sf_dir)
    return P.drain_to_memory(
        P.view_purchase_interval_join_outer(ev), output_mode="append", spark=spark
    )


@register(
    "stream_sliding_window_counts",
    tags=("streaming", "window", "sliding", "watermark"),
    oracle="""
SELECT * FROM (
  SELECT ws AS window_start, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events,
       UNNEST([date_trunc('day', ts), date_trunc('day', ts) - INTERVAL 1 DAY])
         AS u(ws)
  GROUP BY 1, 2
)
WHERE window_start + INTERVAL 2 DAY <= (SELECT max(ts) - INTERVAL 1 DAY FROM events)
""",
)
def stream_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch `sliding_window_counts` expression (2-day hopping
    windows, 1-day slide) run as a STREAM in APPEND mode — the
    batch/stream parity the engine promises: identical F.window call,
    identical oracle (clipped to the finalization line), only the
    source and the state lifecycle differ. Every event enters two
    windows; a window emits exactly once when the watermark passes its
    end (window_end ≤ max event time − 1 day) and is evicted — safe on
    an unbounded source."""
    from pyspark.sql import functions as F

    ev = P.read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "2 days", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.col("w.start").cast("timestamp").alias("window_start"),
            "event_type",
            "n",
        )
    )
    return P.drain_to_memory(agg, output_mode="append", spark=spark)


@register(
    "stream_latest_event_per_user",
    tags=("streaming", "state", "latest"),
    oracle="""
SELECT user_id, ts, event_id, event_type
FROM (
  SELECT user_id, ts, event_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""",
)
def stream_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming latest-state per key — the complement of first-seen
    dedup: a complete-mode max over struct(ts, event_id, …) keeps each
    user's newest event as rows arrive (struct ordering is
    lexicographic, so the event_id tie-break is deterministic and the
    state is ONE struct per key). The oracle is the batch QUALIFY
    rn=1 image — stream and batch must converge to identical rows.
    Latest-state-per-key is inherently complete/update-mode (the
    answer for a key changes forever); state is one struct per
    DISTINCT user, so this assumes a bounded key universe — the
    standard materialized-view pattern, sized by users, not events."""
    from pyspark.sql import functions as F

    ev = P.read_events_stream(spark, sf_dir)
    agg = (
        ev.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "event_type")).alias("m"))
        .select(
            "user_id",
            F.col("m.ts").alias("ts"),
            F.col("m.event_id").alias("event_id"),
            F.col("m.event_type").alias("event_type"),
        )
    )
    return P.drain_to_memory(agg, output_mode="complete", spark=spark)


@register(
    "stream_daily_distinct_users_hll",
    tags=("streaming", "window", "watermark", "append", "sketch", "hll"),
    oracle="""
SELECT * FROM (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         count(DISTINCT user_id) AS approx_users
  FROM events
  GROUP BY 1
)
WHERE day + INTERVAL 1 DAY <= (SELECT max(ts) - INTERVAL 1 DAY FROM events)
""",
)
def stream_daily_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct users per day via HLL sketches, append mode
    — the streaming face of operators/sketches: per-window state is a
    fixed-size sketch (never the user-id set), so a day with a billion
    distinct users costs the same 16 KB of state as a day with fifty;
    an exact streaming countDistinct would hold every id in the state
    store until the watermark fires. Exact at this SF (sparse regime,
    lgk=14); the same plan reports ±1% on real volumes. Oracle clips
    to the watermark-finalized windows like the other append drains."""
    ev = P.read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))).alias(
                "approx_users"
            )
        )
        .select(F.col("w.start").alias("day"), "approx_users")
    )
    sink = P.drain_to_memory(agg, output_mode="append", spark=spark)
    return sink.select("day", "approx_users")


@register(
    "stream_foreachbatch_upsert_latest",
    bench=True,
    tags=("streaming", "foreach_batch", "upsert", "sink"),
    oracle="""
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""",
)
def stream_foreachbatch_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming upsert SINK (foreachBatch): micro-batches merge their
    per-user latest event into a keyed parquet target — the pattern
    behind every streaming-into-lakehouse pipeline (with Delta/Iceberg
    the batch body becomes MERGE INTO; the streaming side is
    identical). Winner per key is max(µs timestamp, event_id) — the
    exact key both engines agree on — so the target's final state is
    arrival-order-independent and the batch row_number() oracle gates
    it exactly. Target + checkpoint live in a FRESH mkdtemp per
    invocation, so concurrent runs (driver scoring alongside a local
    replay) can never race on a shared staging path; roots are swept
    at process exit (sources/staging.py)."""
    from oamap_spark.sources.staging import staging_path

    target = staging_path("oamap_upsert_", "upsert_latest")
    ev = P.read_events_stream(spark, sf_dir)
    P.foreach_batch_upsert_latest(ev, spark, target)
    return spark.read.parquet(target).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
    )


@register(
    "stream_chained_hourly_to_daily",
    tags=("streaming", "window", "chained", "watermark", "append"),
    oracle="""
SELECT * FROM (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT date_trunc('hour', ts)) AS BIGINT) AS n_hours
  FROM events
  GROUP BY 1
)
WHERE day + INTERVAL 1 DAY <= (SELECT max(ts) - INTERVAL 1 DAY FROM events)
""",
)
def stream_chained_hourly_to_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED streaming window aggregations (Spark 3.5+/4): hourly
    counts re-windowed into daily totals inside ONE streaming query —
    two stateful operators back to back, with the watermark propagating
    through the chain (the daily window finalizes when the upstream
    hourly windows it contains are final). Pre-3.5 this required two
    queries with an intermediate sink; the chained form is the 100 TB
    rollup cascade (minute→hour→day) as one exactly-once pipeline.
    Append mode: each day emits once; the oracle clips to the same
    finalization line as the single-level tumbling query."""
    ev = P.read_events_stream(spark, sf_dir)
    hourly = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 hour").alias("hw"))
        .agg(F.count(F.lit(1)).alias("hn"))
    )
    daily = (
        hourly.groupBy(F.window(F.col("hw"), "1 day").alias("dw"))
        .agg(F.sum("hn").alias("n"), F.count(F.lit(1)).alias("n_hours"))
    )
    sink = P.drain_to_memory(
        daily.select(F.col("dw.start").alias("day"), "n", "n_hours"),
        output_mode="append",
        spark=spark,
    )
    return sink.select("day", F.col("n").cast("long").alias("n"), "n_hours")


from oamap_spark.queries.llm_dedup import minhash_pairs_ctes  # noqa: E402


@register(
    "stream_incremental_minhash_dedup",
    tags=("streaming", "foreach_batch", "dedup", "minhash", "incremental"),
    oracle=f"""
WITH {minhash_pairs_ctes()}
SELECT id_a, id_b, jaccard FROM mh_pairs
""",
)
def stream_incremental_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS-INGESTION near-dedup, streamed end to end: the
    documents table replays as 4 ordered arrival micro-batches
    (maxFilesPerTrigger=1 + availableNow over mtime-ordered slices);
    each batch tokenizes only itself, probes the accumulated parquet
    signature index with the asymmetric incremental band join, emits
    its arrival-touching pairs, and appends its signatures to the
    index (streaming/pipelines.py:foreach_batch_incremental_minhash).
    Every near-dup pair surfaces exactly once — when its later member
    arrives — so the ACCUMULATED pairs table equals the one-shot
    batch pair list however the stream is sliced, and the oracle
    replays the plain batch MinHash pipeline against the streaming
    output: the strongest gate a streaming operator can have. This is
    the production loop dedup_minhash_incremental models one batch
    of."""
    from oamap_spark.sources.staging import staging_path

    src = P.staged_documents_slices(spark, sf_dir, n_slices=4)
    index_dir = staging_path("oamap_incr_dedup_", "index")
    pairs_dir = staging_path("oamap_incr_dedup_", "pairs")
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    P.foreach_batch_incremental_minhash(stream, spark, index_dir, pairs_dir)
    # project away the batch=<id> partition column of the idempotent
    # per-batch sink layout (pipelines.py: exactly-once engineering)
    return spark.read.parquet(pairs_dir).select("id_a", "id_b", "jaccard")
