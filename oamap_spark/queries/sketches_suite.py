"""Sketch-rollup declared queries (capability absent from the
reference — oamap has no distinct-count surface at all [H]; this is
the §2.D approximate-aggregation row taken to its 100 TB form).

Both queries follow the two-level pattern from
:mod:`oamap_spark.operators.sketches`: build fine-grained HLL
sketches once, then answer a coarser distinct-count question by
merging sketches — never re-shuffling raw values. With ``lgk=14``
every cardinality at oracle/bench SF sits in the sketch's exact
sparse regime, so the estimates hash-match DuckDB's exact COUNT
(DISTINCT) and the full plan (sketch → union → estimate) is
oracle-gated, not rows-only. ``tests/test_sketches.py`` pins the
dense-regime error bound separately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oamap_spark.operators import sketches as SK
from oamap_spark.queries.registry import register
from oamap_spark.sources.tables import load_table


@register(
    "hll_region_distinct_customers",
    tags=("sketch", "hll", "approx_distinct", "rollup"),
    oracle="""
SELECT r.r_name AS region,
       count(DISTINCT c.c_custkey) AS approx_customers
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name
""",
)
def hll_region_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per region from per-nation HLL sketches.

    The sketch table (nation → sketch) is the stored artifact; the
    region answer is a union of ≤ 5 fixed-size sketches per group. At
    100 TB the same two-level plan never shuffles a customer key:
    tasks sketch locally, registers merge. Nation/region dims are
    broadcast (small-side)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    per_nation = SK.group_sketches(
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey),
        ["n_regionkey", "n_nationkey"],
        "c_custkey",
    )
    rolled = SK.rollup_estimate(per_nation, ["n_regionkey"], out="approx_customers")
    return (
        rolled.join(F.broadcast(region), rolled.n_regionkey == region.r_regionkey)
        .select(F.col("r_name").alias("region"), "approx_customers")
    )


@register(
    "hll_weekly_users_from_daily_sketches",
    bench=True,
    tags=("sketch", "hll", "approx_distinct", "reaggregation"),
    oracle="""
SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
       count(DISTINCT user_id) AS approx_users
FROM events
GROUP BY 1
""",
)
def hll_weekly_users_from_daily_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly distinct users re-aggregated from *daily* user sketches.

    The production shape: a pipeline stores one HLL sketch per (day)
    — here built inline — and any coarser window (week, month,
    trailing-28-day) is answered by unioning a handful of daily rows.
    The raw events are scanned once ever; re-rollups are O(days), not
    O(events). Exact at this SF (sparse regime); ±1.6% at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    daily = SK.group_sketches(
        ev.withColumn("day", F.date_trunc("day", "ts")), ["day"], "user_id"
    )
    weekly = SK.rollup_estimate(
        daily.withColumn("week", F.date_trunc("week", "day")),
        ["week"],
        out="approx_users",
    )
    return weekly


@register(
    "bitmap_distinct_custs_by_priority",
    tags=("sketch", "bitmap", "exact_distinct", "reaggregation"),
    oracle="""
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_custs
FROM orders
GROUP BY o_orderpriority
""",
)
def bitmap_distinct_custs_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct ordering customers per priority, re-aggregated
    from monthly bitmap sketches — the integer-key companion to the
    HLL queries: same two-level stored-sketch shape, but bitwise-OR
    merge gives exact counts at every rollup level (no ±1%). State per
    (group, 32k-key bucket) is a 4 KB bitmap whatever the row count;
    only bitmaps shuffle, never customer keys."""
    from oamap_spark.operators.sketches import (
        bitmap_group_sketches,
        bitmap_rollup_count,
    )

    orders = load_table(spark, sf_dir, "orders")
    monthly = bitmap_group_sketches(
        orders.withColumn("month", F.date_trunc("month", "o_orderdate")),
        ["o_orderpriority", "month"],
        "o_custkey",
    )
    return bitmap_rollup_count(monthly, ["o_orderpriority"], out="n_custs")


@register(
    "hll_intersection_view_purchase",
    tags=("sketch", "hll", "intersection", "inclusion_exclusion"),
    oracle="""
WITH u AS (
  SELECT user_id,
         bool_or(event_type = 'view') AS v,
         bool_or(event_type = 'purchase') AS p
  FROM events
  GROUP BY user_id
)
SELECT CAST(sum(CASE WHEN v THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(sum(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN v AND p THEN 1 ELSE 0 END) AS BIGINT) AS n_both
FROM u
""",
)
def hll_intersection_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap via sketch inclusion–exclusion: distinct users
    who VIEWED ∩ users who PURCHASED, computed as |A| + |B| − |A∪B|
    from two HLL sketches — never re-shuffling user ids. This is the
    set-algebra face of the sketch story (union is native register
    merge; intersection is derived): two stored per-segment sketches
    answer any pairwise overlap question at metadata cost. The 1×1
    crossJoin combines two single-row sketch aggregates — scalars, not
    data. Exact at this SF (sparse regime ⇒ oracle-gated); at 100 TB
    the same plan returns estimates whose error grows with
    |A∪B|/|A∩B| — the documented trade of sketched intersections."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "view").agg(
        SK.sketch("user_id").alias("sk_v")
    )
    b = ev.where(F.col("event_type") == "purchase").agg(
        SK.sketch("user_id").alias("sk_p")
    )
    both = a.crossJoin(F.broadcast(b))
    est_v = F.hll_sketch_estimate("sk_v")
    est_p = F.hll_sketch_estimate("sk_p")
    est_union = F.hll_sketch_estimate(F.hll_union("sk_v", "sk_p"))
    return both.select(
        est_v.alias("n_view"),
        est_p.alias("n_purchase"),
        (est_v + est_p - est_union).alias("n_both"),
    )
