"""TPC-H-shaped breadth queries (third tranche): the six shapes the
first two tranches don't cover — correlated MIN (Q2), group-vs-total
scalar threshold (Q11), left-outer distribution (Q13), count-distinct
with NOT IN (Q16), nested quantified subqueries (Q20), and the
double-correlated EXISTS / NOT EXISTS (Q21).

The testdata has no partsupp table, so Q2/Q11/Q16/Q20 derive the
part↔supplier relation from lineitem (each adaptation documented on the
query). Thresholds that compare a float aggregate against a scaled
float total are computed in **integer cents** (per-row ``floor(x*100 +
0.5)`` then BIGINT sum) on both engines — double sums are
order-nondeterministic at the ULP level and the driver's value-hash
oracle would flap on boundary rows otherwise (same discipline as
tpch2.q9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oamap_spark.queries.registry import register
from oamap_spark.sources.tables import load_tables


@register(
    "q2_min_cost_supplier",
    tags=("join", "correlated_min", "window"),
    oracle="""
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY 1, 2
),
eligible AS (
  SELECT ps.l_partkey, ps.l_suppkey, ps.cost
  FROM supply ps
  JOIN supplier s ON ps.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'REGION_1'
)
SELECT p.p_partkey, p.p_name, s.s_name, round(e.cost, 4) AS min_cost
FROM eligible e
JOIN part p     ON e.l_partkey = p.p_partkey
JOIN supplier s ON e.l_suppkey = s.s_suppkey
WHERE p.p_size BETWEEN 1 AND 15
  AND e.cost = (SELECT min(e2.cost) FROM eligible e2
                WHERE e2.l_partkey = e.l_partkey)
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp ⇒ the part↔supplier supply relation
    is derived from lineitem; supply cost = min unit price ever
    charged): cheapest REGION_1 supplier per small part. The correlated
    MIN subquery becomes a window min partitioned by partkey over the
    already-aggregated supply rows — no re-scan of lineitem, and the
    window input is |parts|×|suppliers-per-part|, tiny relative to the
    fact table at any SF. Unit price is an IEEE division, identical on
    both engines, so the min-equality compare is exact; rounding is
    display-only."""
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "nation", "region", "part")
    supply = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    eligible = (
        supply.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "REGION_1")
        .select("l_partkey", "l_suppkey", "cost", "s_name")
    )
    best = eligible.withColumn(
        "mn", F.min("cost").over(Window.partitionBy("l_partkey"))
    ).where(F.col("cost") == F.col("mn"))
    return (
        best.join(
            t["part"].where(F.col("p_size").between(1, 15)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("p_partkey", "p_name", "s_name", F.round("cost", 4).alias("min_cost"))
    )


@register(
    "q11_important_part_value",
    tags=("agg", "scalar_subquery", "having"),
    oracle="""
WITH partval AS (
  SELECT l.l_partkey,
         CAST(sum(CAST(floor(l.l_extendedprice * l.l_quantity * 100 + 0.5) AS BIGINT))
              AS BIGINT)
           AS value_cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_1'
  GROUP BY 1
)
SELECT l_partkey, value_cents
FROM partval
WHERE value_cents > (SELECT sum(value_cents) FROM partval) * 0.001
""",
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (no partsupp availqty ⇒ "inventory value" =
    shipped extendedprice×quantity through NATION_1 suppliers): parts
    whose value exceeds 0.1% of the national total. The scalar subquery
    is a singleton agg cross-joined (broadcast) onto the per-part rows
    — one pass over the grouped data, no second fact scan. Integer
    cents make the > threshold deterministic under either engine's
    summation order."""
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "nation")
    cents = F.floor(
        F.col("l_extendedprice") * F.col("l_quantity") * 100 + 0.5
    ).cast("long")
    partval = (
        t["lineitem"]
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name") == "NATION_1")
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("value_cents"))
    )
    total = partval.agg(F.sum("value_cents").alias("total_cents"))
    return (
        partval.crossJoin(F.broadcast(total))
        .where(F.col("value_cents") > F.col("total_cents") * 0.001)
        .select("l_partkey", "value_cents")
    )


@register(
    "q13_order_count_distribution",
    tags=("outer_join", "agg", "distribution"),
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY 1
) per_cust
GROUP BY c_count
""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (comment-filter → priority filter): distribution of
    non-5-LOW order counts per customer, zero-order customers included
    — the filter must live in the LEFT JOIN's ON clause, not a WHERE
    (a WHERE would silently drop the zero bucket). Two shuffles
    (custkey join + tiny c_count regroup); count(col) skips nulls on
    both engines, giving the 0 bucket for free."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    o = t["orders"].where(F.col("o_orderpriority") != "5-LOW").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q16_supplier_part_counts",
    tags=("join", "count_distinct", "not_in"),
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
  )
GROUP BY 1, 2, 3
""",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp → lineitem as the part↔supplier
    relation; "complaint" suppliers → negative account balance): how
    many distinct clean suppliers ship each surviving (brand, type,
    size). NOT IN over a no-null key column is a left-anti join; the
    part filters prune before the fact join. countDistinct expands to
    a two-phase partial/final distinct agg — no extra shuffle beyond
    the group keys."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    bad = t["supplier"].where(F.col("s_acctbal") < 0.0).select("s_suppkey")
    p = t["part"].where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    j = (
        t["lineitem"]
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
    )
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


@register(
    "q20_dominant_shippers",
    tags=("join", "nested_subquery", "semi"),
    oracle="""
WITH promo_1997 AS (
  SELECT l.l_suppkey, l.l_partkey,
         sum(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)) AS qty_c
  FROM lineitem l
  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
    AND l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT ps.l_suppkey FROM promo_1997 ps
  WHERE ps.qty_c > 0.5 * (SELECT sum(ps2.qty_c) FROM promo_1997 ps2
                          WHERE ps2.l_partkey = ps.l_partkey)
)
ORDER BY s.s_suppkey
""",
)
def q20_dominant_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (partsupp availqty → shipped quantity):
    suppliers that shipped more than half of some PROMO part's 1997
    volume. Three nested quantified subqueries collapse into one
    aggregation tree: group (supp, part), window-total per part,
    filter, then semi-join supplier — lineitem is scanned once.
    Quantities in integer cents so the 0.5×total compare can't flap."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    promo = t["part"].where(F.col("p_type") == "PROMO").select("p_partkey")
    qty_c = F.floor(F.col("l_quantity") * 100 + 0.5).cast("long")
    per_sp = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(promo, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(qty_c).alias("qty_c"))
    )
    dominant = (
        per_sp.withColumn(
            "part_total", F.sum("qty_c").over(Window.partitionBy("l_partkey"))
        )
        .where(F.col("qty_c") > 0.5 * F.col("part_total"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_lone_late_suppliers",
    tags=("join", "exists", "not_exists", "self_join"),
    oracle="""
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY 1
""",
)
def q21_lone_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (no receipt/commit dates ⇒ "late" = shipped
    >60 days after the order date): per supplier, count finished-order
    line items where that supplier was late and **no other** supplier
    on the order was. The EXISTS / NOT EXISTS pair — correlated on
    both lineitem and the outer orders row — is rewritten as one
    order-level aggregation: distinct suppliers and distinct *late*
    suppliers per order (computed from a single lineitem⋈orders join),
    then a line qualifies iff it is late, the order has ≥2 suppliers,
    and exactly 1 late supplier. Two shuffles total (orderkey join +
    order-level agg) vs the naive triple self-join's four.

    The joined (l_orderkey, l_suppkey, is_late) projection is consumed
    by BOTH the order-level aggregation and the qualifying-line filter
    — without the persist the lineitem scan and the orders join run
    twice per query (r12, guide §1.4/§5; VERDICT r11 "Next round #7").
    Projected to the three columns both consumers need before
    persisting, so the cache holds narrow rows, not full lineitem.
    Caller owns the lifetime via cache.track."""
    from oamap_spark.cache import track

    t = load_tables(spark, sf_dir, "lineitem", "orders", "supplier")
    lo = track(
        t["lineitem"]
        .join(
            t["orders"].where(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn(
            "is_late",
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        )
        .select("l_orderkey", "l_suppkey", "is_late")
    )
    order_stats = lo.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    qual = (
        lo.join(order_stats, F.col("l_orderkey") == F.col("ok"))
        .where(F.col("is_late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    return (
        qual.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
