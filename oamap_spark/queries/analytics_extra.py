"""Second-wave analytics coverage: statistical moments, date-spine gap
fill, rank-variant windows, approximate percentiles, and outer-explode
null semantics (SURVEY §2.D widening)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oamap_spark.queries.registry import register
from oamap_spark.sources.tables import load_table


@register(
    "stats_moments_suite",
    tags=("agg", "stats", "moments"),
    oracle="""
SELECT l_returnflag,
       count(*) AS n,
       round(stddev_samp(l_quantity), 6) AS sd_qty,
       round(var_samp(l_quantity), 6) AS var_qty,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
       round(avg(l_discount), 6) AS avg_disc
FROM lineitem
GROUP BY l_returnflag
""",
)
def stats_moments_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per return flag: sample stddev /
    variance, Pearson correlation, sample covariance. All algebraic
    aggregates — single shuffle with map-side partials at any scale;
    rounded on both engines so the (identical to ~1e-14 relative)
    float sums hash equal."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )


@register(
    "date_spine_gap_fill",
    tags=("join", "date_spine", "gap_fill"),
    oracle="""
WITH spine AS (
  SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31',
                                     INTERVAL 1 DAY)) AS DATE) AS day
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n,
         round(sum(o_totalprice), 2) AS total
  FROM orders
  WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-01'
  GROUP BY 1
)
SELECT s.day, coalesce(d.n, 0) AS n, coalesce(d.total, 0.0) AS total
FROM spine s LEFT JOIN daily d ON s.day = d.day
""",
)
def date_spine_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily order series over a fixed Q1-1995 spine:
    calendar days with zero orders appear with n=0 (the OLAP
    time-series densification idiom). The spine is generated (one row,
    sequence, explode — no table scan) and the daily aggregate joins
    onto it; the spine side is tiny and broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit("1995-01-01")),
                F.to_date(F.lit("1995-03-31")),
            )
        ).alias("day")
    )
    daily = (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1995-01-01"))
            & (F.col("o_orderdate") < F.lit("1995-04-01"))
        )
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
    return F.broadcast(spine).join(daily, "day", "left").select(
        "day",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("total", F.lit(0.0)).alias("total"),
    )


@register(
    "window_rank_variants",
    tags=("window", "ntile", "percent_rank", "cume_dist"),
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 6) AS pr,
       round(cume_dist() OVER w, 6) AS cd
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
""",
)
def window_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-variant window family (ntile / percent_rank /
    cume_dist) per customer, price-ordered. o_orderkey appended to the
    ordering so ntile's bucket assignment is deterministic under price
    ties. One shuffle on the partition key."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "percentile_approx_price",
    tags=("agg", "percentile", "approx"),
    # approximate sketch (GK/KLL-style) — engine-internal; accuracy vs
    # the exact percentiles is asserted in tests → rows-only gate.
    oracle=None,
)
def percentile_approx_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles of o_totalprice (p25/p50/p75/p95) via
    percentile_approx with accuracy 10⁴ — the sketch is mergeable, so
    at 100 TB this is one map-side sketch per partition + a tiny
    reduce, never a global sort (the exact-percentile oracle twin
    `percentiles_order_price` is the global-sort form)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.percentile_approx(
            "o_totalprice", [0.25, 0.5, 0.75, 0.95], 10000
        ).alias("approx_pcts")
    )


@register(
    "explode_outer_null_semantics",
    tags=("generator", "explode_outer", "nulls"),
    oracle="""
WITH t AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'O' THEN []
              WHEN o_orderstatus = 'F' THEN NULL
              ELSE [o_orderpriority, o_orderstatus] END AS arr
  FROM orders
),
x AS (
  SELECT o_orderkey,
         unnest(CASE WHEN arr IS NULL OR len(arr) = 0
                     THEN [NULL] ELSE arr END) AS item
  FROM t
)
SELECT o_orderkey, item FROM x
""",
)
def explode_outer_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer's null semantics pinned: NULL arrays and EMPTY
    arrays both keep their parent row with item=NULL (plain explode
    would drop them — the classic silent-row-loss bug in nested
    pipelines; oamap's masked-list distinction, SURVEY §7.5). The
    oracle encodes the same contract via the [NULL]-substitution
    idiom."""
    orders = load_table(spark, sf_dir, "orders")
    arr = (
        F.when(F.col("o_orderstatus") == "O", F.array().cast("array<string>"))
        .when(F.col("o_orderstatus") == "F", F.lit(None).cast("array<string>"))
        .otherwise(F.array("o_orderpriority", "o_orderstatus"))
    )
    return orders.select(
        "o_orderkey", F.explode_outer(arr).alias("item")
    )
