"""Declared queries exercising the oamap-15 structural combinators
(SURVEY §2.A) on real testdata.

The flat TPC-H tables are first *nested* (lineitems per order, events
per user — ``collect_list(struct(...))``) to reproduce oamap's
list-of-records shape, then the combinators operate per-element via
higher-order functions, and the result is flattened back so DuckDB can
express the oracle with plain SQL / QUALIFY.

Scale note: the nest step is a single hash-shuffle on the group key —
the same shuffle a groupBy would pay — and everything per-element after
it is narrow. At 100 TB you'd nest once and reuse (oamap's persistent
nested layout); here each query stands alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oamap_spark.operators import structural as ops
from oamap_spark.queries.registry import register
from oamap_spark.sources.tables import load_table


def _nest_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → one row per order with items: array<struct>, ordered
    by l_linenumber (deterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    item = F.struct(
        F.col("l_linenumber"),
        F.col("l_quantity"),
        F.col("l_extendedprice"),
        F.col("l_discount"),
        F.col("l_returnflag"),
    )
    return (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list(item)).alias("items"))
    )


@register(
    "nest_unnest_roundtrip",
    tags=("structural", "flatten", "nest"),
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
""",
)
def nest_unnest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """oamap round-trip pattern (SURVEY §5): shred rows into nested
    lists, flatten back, recover the original relation exactly.
    Exercises: nest (collect_list), flatten (top-level list → rows),
    keep (nested column pruning)."""
    nested = _nest_lineitems(spark, sf_dir)
    kept = ops.keep(nested, "l_orderkey", "items.l_linenumber", "items.l_quantity", "items.l_extendedprice")
    flat = ops.flatten(kept, "items")
    return flat.select(
        "l_orderkey",
        F.col("items.l_linenumber").alias("l_linenumber"),
        F.col("items.l_quantity").alias("l_quantity"),
        F.col("items.l_extendedprice").alias("l_extendedprice"),
    )


@register(
    "nested_filter_define_reduce",
    tags=("structural", "filter", "define", "reduce"),
    bench=True,
    oracle="""
SELECT
  l_orderkey,
  coalesce(sum(CASE WHEN l_quantity > 30
        THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
        END), 0) / 100.0 AS big_revenue,
  count(CASE WHEN l_quantity > 30 THEN 1 END)               AS n_big
FROM lineitem
GROUP BY l_orderkey
""",
)
def nested_filter_define_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """oamap pipeline: filter(at='items') → define(at='items') →
    per-record aggregate fold — all per-element, no second shuffle
    after the nest."""
    nested = _nest_lineitems(spark, sf_dir)
    big = ops.filter_(nested, lambda x: x["l_quantity"] > 30, at="items")
    # exact integer cents (floor(x*100+0.5) is bit-identical across
    # engines, unlike round() on doubles) → the fold is an exact bigint
    # sum, immune to FP association order
    priced = ops.define(
        big,
        "disc_price_cents",
        lambda x: F.floor(x["l_extendedprice"] * (1 - x["l_discount"]) * 100 + 0.5).cast(
            "long"
        ),
        at="items",
    )
    return priced.select(
        "l_orderkey",
        (
            F.aggregate("items", F.lit(0).cast("long"), lambda acc, x: acc + x["disc_price_cents"])
            / 100.0
        ).alias("big_revenue"),
        F.size("items").cast("long").alias("n_big"),
    )


@register(
    "nested_index_positions",
    tags=("structural", "index"),
    oracle="""
SELECT event_id, user_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS pos
FROM events
""",
)
def nested_index_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """index() — attach each element's position within its list
    (oamap/operations.py — index). Events nested per user ordered by
    (ts, event_id), indexed, flattened back."""
    ev = load_table(spark, sf_dir, "events")
    # sort on (µs, event_id) — DuckDB truncates parquet ns→µs, so the
    # oracle can only order at µs; event_id breaks µs ties identically
    nested = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.unix_micros("ts").alias("ts_us"), "event_id"))
        ).alias("seq")
    )
    indexed = ops.index(nested, "pos", "seq")
    flat = ops.flatten(indexed, "seq")
    return flat.select(
        F.col("seq.event_id").alias("event_id"),
        "user_id",
        F.col("seq.pos").alias("pos"),
    )


@register(
    "nested_parents_backref",
    tags=("structural", "parents"),
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus AS parent_status
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_linenumber <= 2
""",
)
def nested_parents_backref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parents() — each nested element gains a back-reference struct to
    its enclosing record (oamap/operations.py — parents). Here the
    enclosing record is the order; elements are its lineitems."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") <= 2)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    nested = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderstatus")
        .agg(F.array_sort(F.collect_list(F.struct("l_linenumber"))).alias("items"))
    )
    withp = ops.parents(nested, "order", "items", ["l_orderkey", "o_orderstatus"])
    flat = ops.flatten(withp, "items")
    return flat.select(
        F.col("items.order.l_orderkey").alias("l_orderkey"),
        F.col("items.l_linenumber").alias("l_linenumber"),
        F.col("items.order.o_orderstatus").alias("parent_status"),
    )


@register(
    "nested_topk_per_group",
    tags=("structural", "topk", "array_sort"),
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
QUALIFY row_number() OVER (
  PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber) <= 2
""",
)
def nested_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via nested array_sort(comparator) + slice — the
    shuffle-once alternative to a window row_number at scale (no
    second sort over the full fact table)."""
    nested = _nest_lineitems(spark, sf_dir)

    def cmp(a, b):
        return (
            F.when(a["l_extendedprice"] > b["l_extendedprice"], F.lit(-1))
            .when(a["l_extendedprice"] < b["l_extendedprice"], F.lit(1))
            .otherwise(
                F.when(a["l_linenumber"] < b["l_linenumber"], F.lit(-1)).otherwise(F.lit(1))
            )
        )

    top2 = nested.select(
        "l_orderkey", F.slice(F.array_sort("items", cmp), 1, 2).alias("items")
    )
    flat = ops.flatten(top2, "items")
    return flat.select(
        "l_orderkey",
        F.col("items.l_linenumber").alias("l_linenumber"),
        F.col("items.l_extendedprice").alias("l_extendedprice"),
    )


@register(
    "tomask_sentinel_nulls",
    tags=("structural", "tomask", "nulls"),
    oracle="""
SELECT
  l_returnflag,
  round(avg(CASE WHEN l_discount BETWEEN 0.0 AND 0.01 THEN NULL
                 ELSE l_discount END), 4) AS avg_real_disc,
  count(CASE WHEN l_discount BETWEEN 0.0 AND 0.01 THEN 1 END) AS n_masked
FROM lineitem
GROUP BY l_returnflag
""",
)
def tomask_sentinel_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tomask() — sentinel range → NULL (oamap/operations.py — tomask);
    nulls then flow through avg (null-ignoring, same as oamap masks)."""
    li = load_table(spark, sf_dir, "lineitem")
    masked = ops.tomask(li.withColumn("disc_m", F.col("l_discount")), "disc_m", 0.0, 0.01)
    return (
        masked.groupBy("l_returnflag")
        .agg(
            F.round(F.avg("disc_m"), 4).alias("avg_real_disc"),
            F.count(F.when(F.col("disc_m").isNull() & F.col("l_discount").isNotNull(), 1)).alias(
                "n_masked"
            ),
        )
    )


@register(
    "project_keep_drop_pipeline",
    tags=("structural", "project", "keep", "drop", "fieldname"),
    oracle="""
SELECT o_orderkey AS okey, o_totalprice AS price
FROM orders
WHERE o_totalprice > 100000
""",
)
def project_keep_drop_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """keep → drop → fieldname chained (metadata-only pruning ops;
    parquet ReadSchema shrinks accordingly)."""
    o = load_table(spark, sf_dir, "orders")
    out = ops.keep(o, "o_orderkey", "o_totalprice", "o_orderstatus")
    out = ops.drop(out, "o_orderstatus")
    out = ops.fieldname(out, "okey", "o_orderkey")
    out = ops.fieldname(out, "price", "o_totalprice")
    return ops.filter_(out, F.col("price") > 100000)


@register(
    "split_merge_restructure",
    tags=("structural", "split", "merge"),
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal >= 0
""",
)
def split_merge_restructure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge fields into a struct, then split them back out — inverse
    ops round-trip (oamap/operations.py — split/merge)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    merged = ops.merge(c, "info", "c_name", "c_acctbal")
    back = ops.split(merged, "info.c_name", "info.c_acctbal")
    return back.select("c_custkey", "c_name", "c_acctbal").where(F.col("c_acctbal") >= 0)
