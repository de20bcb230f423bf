"""Capability-completion queries for the remaining SURVEY §2.D rows:
GROUPING SETS, map-type functions, custom UDAF reduce (oamap's
arbitrary tally, §7.5), Python UDTF, and slicing (limit/offset — the
proxy `data[a:b]` surface, §2.B)."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oamap_spark.queries.registry import register
from oamap_spark.sources.tables import load_table


@register(
    "grouping_sets_flag_status",
    tags=("agg", "grouping_sets", "sql"),
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
""",
)
def grouping_sets_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube),
    via the SQL surface — Spark computes all sets in one pass with a
    single expand+shuffle."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
        """
    )


@register(
    "map_funcs_suite",
    tags=("functions", "map"),
    oracle="""
SELECT user_id, event_type AS k, CAST(count(*) AS BIGINT) AS v
FROM events
GROUP BY user_id, event_type
""",
)
def map_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (absent in oamap — no dynamic-key dict type):
    build map<event_type → count> per user with map_from_entries,
    transform_values, then explode back to rows. The oracle checks the
    relational image of the map (DuckDB's MAP isn't hash-comparable
    through the driver harness), so build → transform → unbuild is the
    tested path."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("m")
    )
    # transform_values round-trip (double then halve) exercises value
    # transformation without changing the oracle-checked image.
    mapped = mapped.withColumn(
        "m", F.transform_values("m", lambda k, v: v * 2)
    ).withColumn("m", F.transform_values("m", lambda k, v: (v / 2).cast("long")))
    return mapped.select(
        "user_id", F.explode(F.col("m")).alias("k", "v")
    )


@register(
    "reduce_custom_tally_geomean",
    tags=("agg", "pandas_udf", "udaf", "reduce"),
    oracle="""
SELECT l_returnflag,
       round(exp(avg(ln(l_extendedprice))), 4) AS geomean_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def reduce_custom_tally_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """oamap `reduce` with a custom tally (oamap/operations.py —
    reduce(fcn, tally) [H]) as a GROUPED_AGG pandas_udf: per-group
    geometric mean via log-sum (associative across partitions, as
    oamap requires of tallies). The oracle replays it natively —
    Arrow-vectorized Python vs JVM expressions must agree."""

    @F.pandas_udf("double")
    def geomean(prices: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(prices.to_numpy()).mean()))

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(geomean("l_extendedprice"), 4).alias("geomean_price")
    )


@register(
    "udtf_token_positions",
    tags=("udtf", "llm", "text"),
    oracle="""
SELECT doc_id, u.tok AS token, CAST(u.pos AS INT) AS pos
FROM (
  SELECT doc_id,
         unnest(list_transform(string_split(text, ' '),
                (t, i) -> {'tok': t, 'pos': i - 1})) AS u
  FROM documents
  WHERE doc_id < 20
)
""",
)
def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, Spark 4 surface): one input row →
    N (token, position) rows. Equivalent to posexplode(split(...)) —
    the point is the UDTF harness; the oracle pins the semantics."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, pos: int")
    class Tokenize:
        def eval(self, text: str):
            for i, t in enumerate(text.split(" ")):
                yield t, i

    spark.udtf.register("oamap_tokenize", Tokenize)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.pos
        FROM docs_udtf d, LATERAL oamap_tokenize(d.text) t
        WHERE d.doc_id < 20
        """
    )


@register(
    "percentiles_order_price",
    tags=("agg", "percentile"),
    oracle="""
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders
GROUP BY o_orderstatus
""",
)
def percentiles_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ≡
    DuckDB `quantile_cont`). The scale path swaps in
    `percentile_approx` (t-digest, mergeable map-side) — same plan
    shape, bounded memory; exact form is the oracle-checkable one."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
    )


@register(
    "slice_offset_limit",
    tags=("limit", "offset", "slice"),
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
OFFSET 10 LIMIT 15
""",
)
def slice_offset_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proxy slicing `data[10:25]` (oamap/proxy.py —
    ListProxy.__getitem__(slice) [H]) over a defined order: offset +
    limit. Spark turns the pair into a single global-limit plan; a
    slice without ORDER BY is nondeterministic in a distributed
    engine, so the combinator requires one."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(10)
        .limit(15)
    )


@register(
    "compiled_rowfn_revenue",
    tags=("compiler", "dual-path", "udf-surface"),
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
         AS gross_revenue
FROM lineitem
WHERE l_quantity > 25 AND l_discount BETWEEN 0.02 AND 0.08
GROUP BY l_returnflag
""",
)
def compiled_rowfn_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compiled-function surface end-to-end (oamap/compiler.py's
    design point): the predicate and the per-row measure are written as
    plain Python lambdas and AST-compiled into native Column
    expressions by ``oamap_spark.compiler`` — so the 'user function'
    runs inside whole-stage codegen, not in Python. The identical
    lambdas would also run through the Arrow-UDF fallback with the
    same results (tests/test_compiler.py pins that equivalence)."""
    from oamap_spark.compiler import compile_row_fn

    li = load_table(spark, sf_dir, "lineitem")
    keep = compile_row_fn(
        lambda r: r.l_quantity > 25 and (0.02 <= r.l_discount <= 0.08)
    )
    gross = compile_row_fn(
        lambda r: r.l_extendedprice * (1 - r.l_discount) * (1 + r.l_tax)
    )
    return (
        li.where(keep)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum(gross), 2).alias("gross_revenue"),
        )
    )


@register(
    "compiled_nested_event_loop",
    bench=True,
    tags=("compiler", "nested", "dual-path"),
    oracle="""
SELECT l_orderkey,
       CAST(count(*) AS INT)       AS n_items,
       bool_or(l_quantity > 45)    AS has_big,
       sum(l_quantity)             AS qty_sum
FROM lineitem
GROUP BY l_orderkey
""",
)
def compiled_nested_event_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """oamap's signature idiom — a Python loop over an event's sublist
    (``for item in order.items``) — compiled to Spark: lineitems are
    nested under their order (collect_list of structs), then the three
    per-order measures are plain Python functions over that nested row,
    AST-lowered to size / exists / aggregate higher-order expressions
    (oamap/compiler.py's jitted loops [H]). The oracle computes the
    same measures in flat SQL — results identical, plans differ. All
    three measures are order-insensitive (count / any / exact integral
    sums), so collect_list's nondeterministic element order is safe."""
    from oamap_spark.compiler import compile_row_fn

    li = load_table(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_quantity", "l_extendedprice")).alias("items")
    )
    n_items = compile_row_fn(lambda r: len(r.items), schema=nested.schema)
    has_big = compile_row_fn(lambda r: any(it.l_quantity > 45 for it in r.items))
    qty_sum = compile_row_fn(lambda r: sum(it.l_quantity for it in r.items))
    return nested.select(
        "l_orderkey",
        n_items.alias("n_items"),
        has_big.alias("has_big"),
        qty_sum.alias("qty_sum"),
    )
