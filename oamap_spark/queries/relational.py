"""Relational completeness queries (SURVEY §2.D) — the capability
categories the reference lacks entirely (it has no joins, group-by,
windows, sorts, or set ops — absent from ``oamap/operations.py``'s
operator set), supplied by Spark built-ins.

Scale notes are per-query; the common themes:
- Broadcast every bounded-cardinality side (nation=25 rows forever).
- Top-k = orderBy+limit → Catalyst's TakeOrderedAndProject (no global
  sort materialization).
- Window money sums use exact integer cents (see queries/nested.py) so
  the value-hash oracle can't drift with FP association order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oamap_spark.queries.registry import register
from oamap_spark.sources.tables import load_table


def _cents(col):
    return F.floor(col * 100 + 0.5).cast("long")


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------
@register(
    "semi_join_customers_with_orders",
    tags=("join", "semi"),
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
""",
)
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi join — EXISTS without materializing the right side.
    At scale the open-orders side is pre-filtered before the shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "anti_join_customers_without_orders",
    tags=("join", "anti"),
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti join — NOT EXISTS as a single shuffle-hash pass."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "range_join_ship_within_90d",
    tags=("join", "range"),
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS lag_days
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate <  o_orderdate + INTERVAL 90 DAY
  AND o_orderpriority = '1-URGENT'
""",
)
def range_join_ship_within_90d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join: equi key + range predicate. The equi key
    carries the shuffle; the range condition evaluates post-match, so
    this stays a hash join (no BNLJ explosion) at any scale."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_orderdate")
    j = li.join(
        o,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
    )
    return j.select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("long").alias("lag_days"),
    )


@register(
    "theta_join_nation_pairs",
    tags=("join", "theta"),
    oracle="""
SELECT a.n_name AS nation_a, b.n_name AS nation_b
FROM nation a JOIN nation b
  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
""",
)
def theta_join_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) self-join — unordered same-region nation pairs.
    Tiny broadcast side keeps it a BroadcastNestedLoop only over 25
    rows; the equi region key does the real pruning."""
    n = load_table(spark, sf_dir, "nation")
    a = n.alias("a")
    b = n.alias("b")
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(F.col("a.n_name").alias("nation_a"), F.col("b.n_name").alias("nation_b"))
    )


@register(
    "asof_join_latest_order_before_event",
    tags=("join", "asof"),
    oracle="""
SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey
FROM events e
ASOF LEFT JOIN (
    SELECT o_custkey,
           -- dedup to one order per (custkey, orderdate): keep max key,
           -- so the as-of pick is deterministic on timestamp ties
           max(o_orderkey) AS o_orderkey, o_orderdate
    FROM orders GROUP BY o_custkey, o_orderdate
) o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
)
def asof_join_latest_order_before_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (latest order at-or-before each event), Spark-first:
    UNION the two streams, one shuffle+sort per user key, then
    last_value(ignorenulls) over the time-ordered window. No per-row
    subquery, no range explosion — this is the 100 TB-safe pattern
    (one sort-merge pass, same cost as a window function).
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("o_orderkey"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .select(
            F.col("o_custkey").alias("k"),
            F.col("o_orderdate").alias("t"),
            F.lit(0).alias("is_event"),
            F.lit(None).cast("long").alias("event_id"),
            "o_orderkey",
        )
    )
    unioned = ev.unionByName(orders)
    # orders sort before events at the same instant (is_event asc) so
    # an order exactly at the event time is visible to it
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t"), F.col("is_event"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "last_orderkey", F.last("o_orderkey", ignorenulls=True).over(w)
    )
    return (
        carried.where(F.col("is_event") == 1)
        .select("event_id", F.col("k").alias("user_id"), "last_orderkey")
    )


@register(
    "asof_join_tolerance_30d",
    tags=("join", "asof", "tolerance"),
    oracle="""
SELECT e.event_id, e.user_id,
       CASE WHEN o.o_orderdate >= e.ts - INTERVAL 30 DAY
            THEN o.o_orderkey END AS last_orderkey_30d
FROM events e
ASOF LEFT JOIN (
    SELECT o_custkey, max(o_orderkey) AS o_orderkey, o_orderdate
    FROM orders GROUP BY o_custkey, o_orderdate
) o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
)
def asof_join_tolerance_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE window (pandas merge_asof
    `tolerance=` semantics): latest order at-or-before each event, but
    only if it is within 30 days — older matches become NULL. Same
    single union + window pass as the plain as-of (no range explosion;
    one sort-merge per key): the window carries a (time, key) struct
    so the tolerance test reads the matched order's OWN timestamp."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        F.col("event_id"),
        F.lit(None)
        .cast("struct<ot:timestamp,okey:bigint>")
        .alias("order_info"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .select(
            F.col("o_custkey").alias("k"),
            F.col("o_orderdate").alias("t"),
            F.lit(0).alias("is_event"),
            F.lit(None).cast("long").alias("event_id"),
            F.struct(
                F.col("o_orderdate").alias("ot"),
                F.col("o_orderkey").alias("okey"),
            ).alias("order_info"),
        )
    )
    unioned = ev.unionByName(orders)
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t"), F.col("is_event"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "last_o", F.last("order_info", ignorenulls=True).over(w)
    )
    within = F.col("last_o.ot") >= F.col("t") - F.expr("INTERVAL 30 DAY")
    return (
        carried.where(F.col("is_event") == 1)
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            F.when(within, F.col("last_o.okey")).alias("last_orderkey_30d"),
        )
    )


@register(
    "asof_join_forward_next_event",
    tags=("join", "asof", "forward"),
    oracle="""
SELECT o.o_orderkey, o.o_custkey, e.event_id AS next_event_id
FROM orders o
ASOF LEFT JOIN (
    -- dedup to one event per (user, ts): keep max id, so the as-of
    -- pick is deterministic on timestamp ties
    SELECT user_id, ts, max(event_id) AS event_id
    FROM events GROUP BY user_id, ts
) e ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
""",
)
def asof_join_forward_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — the mirror direction of
    ``asof_join_latest_order_before_event``: for each order, the
    EARLIEST event of that customer at-or-after the order date (the
    'next activity' lookup of attribution pipelines; pandas
    merge_asof(direction='forward')). Same 100 TB-safe shape as the
    backward form: union the two streams, ONE shuffle+sort per key,
    and a first_value(ignorenulls) over the forward window
    (currentRow → unboundedFollowing) — no per-row subquery, no range
    explosion."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        F.lit(1).alias("is_order"),
        "o_orderkey",
        F.lit(None).cast("long").alias("event_id"),
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
        .select(
            F.col("user_id").alias("k"),
            F.col("ts").alias("t"),
            F.lit(0).alias("is_order"),
            F.lit(None).cast("long").alias("o_orderkey"),
            "event_id",
        )
    )
    unioned = orders.unionByName(ev)
    # orders sort BEFORE events at the same instant (is_order desc) so
    # an event exactly at the order date is visible to it
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t"), F.col("is_order").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.withColumn(
        "next_event_id", F.first("event_id", ignorenulls=True).over(w)
    )
    return carried.where(F.col("is_order") == 1).select(
        "o_orderkey", F.col("k").alias("o_custkey"), "next_event_id"
    )


# ---------------------------------------------------------------------------
# Group-by variants
# ---------------------------------------------------------------------------
@register(
    "rollup_flag_status",
    tags=("agg", "rollup"),
    oracle="""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity)  AS sum_qty,
       count(*)         AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total). l_quantity is
    integral so the double sum is exact — no rounding needed."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@register(
    "cube_status_priority",
    tags=("agg", "cube"),
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dims — all 4 grouping sets in one
    pass (Spark expands then hash-aggregates; partials still apply)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@register(
    "distinct_brand_type",
    tags=("agg", "distinct"),
    oracle="SELECT DISTINCT p_brand, p_type FROM part",
)
def distinct_brand_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = group-by-all-columns hash aggregate (map-side partial
    dedup first — shuffle carries only unique pairs)."""
    return load_table(spark, sf_dir, "part").select("p_brand", "p_type").distinct()


@register(
    "count_distinct_custs_per_nation",
    tags=("agg", "count_distinct", "join"),
    oracle="""
SELECT n_name, count(DISTINCT c_custkey) AS n_custs,
       count(*) AS n_rows
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def count_distinct_custs_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — Spark plans a two-phase expand +
    aggregate; nation side broadcast."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_custs"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "approx_distinct_parts",
    tags=("agg", "approx", "tolerance_gated"),
    # Tolerance-mode oracle (same pattern as percentile_approx_price):
    # HLL sketches differ between engines, so each engine certifies
    # ITS OWN estimate inside a ±5% band of ITS OWN exact distinct
    # count (2.5× the configured rsd=0.02) and emits the boolean; the
    # exact counts cross-hash between engines.
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact_parts,
       abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
         <= 0.05 * count(DISTINCT l_partkey) AS approx_within_5pct
FROM lineitem
GROUP BY l_returnflag
""",
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB path for
    cardinality estimation: constant memory, one pass, no expand.
    Engine-specific sketch ⇒ the raw estimate can't hash cross-engine;
    gated in tolerance mode instead: |approx − exact| ≤ 5%·exact
    computed engine-side (Spark rsd=0.02 ⇒ 5% is 2.5σ), with the
    exact distinct counts carried for the cross-engine hash."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("a"),
        F.count_distinct("l_partkey").alias("exact_parts"),
    )
    return g.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("a") - F.col("exact_parts"))
            <= 0.05 * F.col("exact_parts")
        ).alias("approx_within_5pct"),
    )


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------
@register(
    "window_rank_orders_per_customer",
    tags=("window", "rank"),
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(rank()       OVER w AS BIGINT) AS rk,
       CAST(dense_rank() OVER w AS BIGINT) AS drk
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
QUALIFY row_number() OVER w <= 3
""",
)
def window_rank_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank over a per-customer window; the
    rn<=3 filter afterwards is Spark's window-group-limit pushdown
    (top-k per key without keeping full partitions)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rk"),
            F.dense_rank().over(w).cast("long").alias("drk"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "window_lag_lead_events",
    tags=("window", "lag", "lead"),
    oracle="""
SELECT event_id, user_id,
       lag(event_type)  OVER w AS prev_type,
       lead(event_type) OVER w AS next_type,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over the per-user event sequence. Gaps in µs: DuckDB
    truncates parquet ns timestamps to µs TIMESTAMP, so the oracle can
    only see µs — we compare at that resolution (ts_ns stays available
    engine-side for exact work)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)).alias(
            "gap_us"
        ),
    )


@register(
    "window_running_totals",
    tags=("window", "running_sum"),
    oracle="""
SELECT o_orderkey, o_custkey,
       sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING) / 100.0 AS running_spend,
       CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            AS BIGINT) AS quartile
FROM orders
""",
)
def window_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + ntile over an ordered frame — integer-cents sum
    keeps the cumulative values exact (frame-order FP association would
    otherwise differ from the oracle's)."""
    o = load_table(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        (F.sum(_cents(F.col("o_totalprice"))).over(w) / 100.0).alias("running_spend"),
        F.ntile(4).over(wo).cast("long").alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops
# ---------------------------------------------------------------------------
@register(
    "topk_orders_by_price",
    tags=("sort", "limit", "topk"),
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k — TakeOrderedAndProject (per-partition heaps + a
    single driver merge of k·partitions rows, never a full sort)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "set_ops_customer_segments",
    tags=("setop", "union", "intersect", "except"),
    oracle="""
(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
 UNION
 SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
EXCEPT
(SELECT c_custkey FROM customer WHERE c_acctbal < 0
 INTERSECT
 SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
""",
)
def set_ops_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union (distinct) / intersect / except composed — each is a
    hash-based set op with map-side partial dedup."""
    c = load_table(spark, sf_dir, "customer")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    auto = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    negative = c.where(F.col("c_acctbal") < 0).select("c_custkey")
    return building.union(auto).distinct().exceptAll(
        negative.intersect(building)
    ).distinct()


@register(
    "salted_join_priority_volume",
    tags=("join", "skew", "salted"),
    oracle="""
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
)
def salted_join_priority_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explicit skew lever as a declared query: lineitem⋈orders
    through ``salted_join`` — the probe side carries a seeded salt, the
    build side replicates across the salt domain, so one pathological
    orderkey would spread over `salt` reducers instead of melting one.
    Results are provably identical to the plain join (the oracle IS the
    plain join); only the shuffle layout differs. AQE's skew splitting
    covers moderate skew on its own — this is the guaranteed-layout
    form for the pathological case (SURVEY §7.4)."""
    from oamap_spark.operators import partitioning as P

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = P.salted_join(orders, li, "o_orderkey", salt=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("qty").cast("long").alias("total_qty"),
    )
