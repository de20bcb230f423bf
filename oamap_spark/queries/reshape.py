"""Reshape surface: pivot (long→wide), unpivot/melt (wide→long), and
value-range histogramming — relational capabilities absent in oamap
(SURVEY §2.D; its schema is fixed by construction) but table stakes
for an analytics engine.

Scale notes: pivot with an explicit value list is a single hash agg
(conditional-sum per pivoted value — no extra shuffle, no driver-side
distinct pass to discover columns); unpivot is a narrow per-row
explode; width_bucket histograms are a narrow map + one small agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oamap_spark.queries.registry import register
from oamap_spark.sources.tables import load_table


@register(
    "pivot_qty_by_returnflag",
    tags=("reshape", "pivot", "agg"),
    oracle="""
SELECT l_linestatus,
       round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS qty_A,
       round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS qty_N,
       round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS qty_R
FROM lineitem
GROUP BY l_linestatus
""",
)
def pivot_qty_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide: total quantity per linestatus, one column per
    returnflag. The explicit value list matters at scale: it turns
    pivot into one conditional-sum hash agg, skipping the extra
    distinct-values job Spark otherwise runs on the driver."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return p.select(
        "l_linestatus",
        F.col("A").alias("qty_A"),
        F.col("N").alias("qty_N"),
        F.col("R").alias("qty_R"),
    )


@register(
    "unpivot_order_measures",
    tags=("reshape", "unpivot", "melt"),
    oracle="""
WITH base AS (
  SELECT o_orderstatus,
         round(sum(o_totalprice), 2) AS sum_price,
         CAST(count(*) AS DOUBLE) AS n_orders
  FROM orders GROUP BY 1
)
SELECT o_orderstatus, 'sum_price' AS metric, sum_price AS value FROM base
UNION ALL
SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS value FROM base
""",
)
def unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long (melt): per-status order measures unpivoted to
    (status, metric, value) rows — a narrow per-row expansion on the
    already-aggregated relation, no shuffle beyond the agg itself."""
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy("o_orderstatus").agg(
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_orders"),
    )
    return base.unpivot(
        ["o_orderstatus"], ["sum_price", "n_orders"], "metric", "value"
    )


@register(
    "histogram_order_price",
    tags=("reshape", "histogram", "width_bucket"),
    oracle="""
SELECT CAST(least(greatest(1 + floor(o_totalprice / 50000.0), 1), 12) AS BIGINT)
         AS bucket,
       count(*) AS n,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders
GROUP BY 1
""",
)
def histogram_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bound 12-bucket histogram of order totals (bucket width
    50k, clamped ends) — a narrow per-row bucket id plus one tiny agg;
    the fixed bounds (not data-dependent min/max) keep it single-pass
    at any scale. The bucket id is explicit floor arithmetic rather
    than width_bucket: DuckDB 1.0 lacks the function, and the shared
    formula makes both engines run identical IEEE ops."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.greatest(1 + F.floor(F.col("o_totalprice") / 50000.0), F.lit(1)), F.lit(12)
    )
    return (
        o.withColumn("bucket", bucket.cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )
