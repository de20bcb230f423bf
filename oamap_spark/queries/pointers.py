"""Pointer & Union declared queries — oamap's two non-relational
schema nodes (SURVEY.md §2, §7.5) exercised on the driver tables.

Pointer ⇒ surrogate key + equi-join (broadcast for dims, co-partitioned
self-join for linked-list shapes). Union ⇒ struct(tag, v0..vn) encode +
tag-dispatch. Oracles replay the semantics relationally."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oamap_spark.operators import links as L
from oamap_spark.queries.registry import register
from oamap_spark.sources.tables import load_table


@register(
    "pointer_deref_supplier_nation",
    tags=("pointer", "join", "broadcast"),
    oracle="""
SELECT n.n_name AS nation,
       count(*) AS n_suppliers,
       round(avg(s.s_acctbal), 2) AS avg_acctbal
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def pointer_deref_supplier_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier.s_nationkey as an oamap Pointer into nation
    (oamap/generator.py — PointerGenerator positions deref [H]):
    resolve via broadcast equi-join, then aggregate over the fetched
    field. The fact side never shuffles for the deref itself."""
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    resolved = L.resolve_pointer(
        sup, "s_nationkey", nat, "n_nationkey", ["n_name"], broadcast=True, how="inner"
    )
    return resolved.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.avg("s_acctbal"), 2).alias("avg_acctbal"),
    )


@register(
    "pointer_self_prev_event",
    tags=("pointer", "self_join", "linked_list"),
    oracle="""
SELECT event_id,
       user_id,
       event_type,
       lag(event_type) OVER w AS prev_event_type,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
""",
)
def pointer_self_prev_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-referential Pointer (oamap linked-list shape): every event
    points at its predecessor in the per-user timeline. Mechanism is
    the honest pointer one — explicit positions + co-partitioned
    self-join on (user_id, pos-1) — which the oracle replays as lag().
    First element's pointer is null (masked pointer). Timestamps are
    compared at µs: the parquet is ns but DuckDB's view truncates to
    µs, so both sides order and subtract on `ts_ns div 1000`."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    out = L.self_pointer_prev(
        ev,
        partition_by=["user_id"],
        order_by=[F.col("ts_us"), F.col("event_id")],
        fields=["event_type", "ts_us"],
    )
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        "prev_event_type",
        (F.col("ts_us") - F.col("prev_ts_us")).alias("gap_us"),
    )


@register(
    "union_event_payload",
    tags=("union", "tagged", "dispatch"),
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(CASE
         WHEN event_type = 'purchase' THEN value
         WHEN event_type IN ('view', 'click') THEN CAST(json_extract(props, '$.k') AS BIGINT) * 0.01
         ELSE -1.0 END), 2) AS payload_score
FROM events
GROUP BY event_type
""",
)
def union_event_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union(amount: double | engagement: long | marker) over events —
    encode struct(tag, v0, v1, v2) with exactly one live slot per row
    (oamap/schema.py — Union tags array [H]), then tag-dispatch into a
    scalar. The oracle replays the dispatch as a CASE chain."""
    ev = load_table(spark, sf_dir, "events")
    tag = (
        F.when(F.col("event_type") == "purchase", 0)
        .when(F.col("event_type").isin("view", "click"), 1)
        .otherwise(2)
    )
    u = L.union_encode(
        tag,
        [
            ("amount", F.col("value")),
            ("engagement", F.get_json_object("props", "$.k").cast("long")),
            ("marker", F.col("event_id")),
        ],
    )
    dispatched = L.union_case(
        F.col("u"),
        F.col("u.amount"),
        F.col("u.engagement") * 0.01,
        F.lit(-1.0),
    )
    return (
        ev.withColumn("u", u)
        .withColumn("score", dispatched)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("score"), 2).alias("payload_score"),
        )
    )
