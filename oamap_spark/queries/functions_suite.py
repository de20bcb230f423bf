"""Scalar-function coverage queries (SURVEY §2.D/§2.E).

oamap has no scalar function library — its scalar surface is "whatever
numpy/Numba can compute over proxies" (``oamap/compiler.py``). The
Spark engine supplies the full `pyspark.sql.functions` suite; these
queries pin down cross-engine-portable semantics for each family
(string, date/time, math, JSON, array, conditional).

Portability rules learned the hard way (see plans/verify.py):
- round() on doubles differs between engines at half boundaries →
  integer-cents pattern for money, or exact-valued inputs.
- Transcendental fns (ln/exp/sin) are libm-dependent → only
  correctly-rounded IEEE ops (sqrt, abs, floor, ceil, power-of-2).
- DuckDB sees parquet ns timestamps at µs; all event-time work is µs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oamap_spark.queries.registry import register
from oamap_spark.sources.tables import load_table


@register(
    "string_funcs_suite",
    tags=("functions", "string"),
    oracle="""
SELECT
  p_partkey,
  upper(p_name)                                   AS name_upper,
  lower(p_brand)                                  AS brand_lower,
  CAST(length(p_name) AS INT)                     AS name_len,
  substring(p_name, 1, 5)                         AS name_pfx,
  concat(p_brand, ':', p_type)                    AS brand_type,
  replace(p_type, ' ', '_')                       AS type_snake,
  CAST(strpos(p_type, 'a') AS INT)                AS first_a,
  trim(lpad(p_brand, 12, '*'))                    AS brand_padded,
  regexp_extract(p_name, '[a-z]+', 0)             AS first_word,
  reverse(p_brand)                                AS brand_rev,
  CAST(starts_with(p_type, 'ST') AS BOOLEAN)      AS is_st,
  split_part(p_type, ' ', 1)                      AS type_head
FROM part
WHERE p_partkey <= 500
""",
)
def string_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family — all JVM-side Catalyst expressions
    (codegen'd; no Python in the loop)."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.instr("p_type", "a").alias("first_a"),
        F.trim(F.lpad("p_brand", 12, "*")).alias("brand_padded"),
        F.regexp_extract("p_name", "[a-z]+", 0).alias("first_word"),
        F.reverse("p_brand").alias("brand_rev"),
        F.startswith("p_type", F.lit("ST")).alias("is_st"),
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_head"),
    )


@register(
    "date_funcs_suite",
    tags=("functions", "date"),
    oracle="""
SELECT
  CAST(date_trunc('month', o_orderdate) AS DATE)      AS month,
  CAST(min(extract(year  FROM o_orderdate)) AS BIGINT) AS min_year,
  CAST(max(extract(dow   FROM o_orderdate)) AS BIGINT) AS max_dow,
  count(*)                                             AS n,
  CAST(max(o_orderdate + INTERVAL 30 DAY) AS DATE)     AS max_due,
  CAST(max(date_diff('day', DATE '1995-01-01', o_orderdate)) AS BIGINT)
                                                       AS max_age_days
FROM orders
GROUP BY 1
""",
)
def date_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: trunc, extract, interval arithmetic, diffs.
    DuckDB's dow is 0=Sunday; Spark's dayofweek is 1=Sunday → align
    with (dayofweek-1)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(
            F.min(F.year("o_orderdate")).cast("long").alias("min_year"),
            F.max(F.dayofweek("o_orderdate") - 1).cast("long").alias("max_dow"),
            F.count(F.lit(1)).alias("n"),
            F.max(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).cast("date").alias(
                "max_due"
            ),
            F.max(F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")))
            .cast("long")
            .alias("max_age_days"),
        )
    )


@register(
    "math_funcs_suite",
    tags=("functions", "math"),
    oracle="""
SELECT
  l_orderkey, l_linenumber,
  abs(l_extendedprice - 50000)            AS abs_dev,
  CAST(ceil(l_quantity / 7)  AS BIGINT)   AS ceil_q7,
  CAST(floor(l_quantity / 7) AS BIGINT)   AS floor_q7,
  sqrt(l_quantity)                        AS sqrt_q,
  l_extendedprice * l_extendedprice       AS price_sq,
  CAST(sign(l_discount - 0.05) AS BIGINT) AS disc_sign,
  CAST(l_quantity AS BIGINT) % 5          AS q_mod5,
  greatest(l_tax, l_discount)             AS max_rate,
  least(l_tax, l_discount)                AS min_rate
FROM lineitem
WHERE l_orderkey <= 300
""",
)
def math_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family restricted to correctly-rounded IEEE ops (sqrt,
    abs, floor/ceil, x*x, sign, mod) — libm-dependent transcendentals
    (ln/exp) intentionally excluded from the cross-engine contract."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000).alias("abs_dev"),
        F.ceil(F.col("l_quantity") / 7).cast("long").alias("ceil_q7"),
        F.floor(F.col("l_quantity") / 7).cast("long").alias("floor_q7"),
        F.sqrt("l_quantity").alias("sqrt_q"),
        (F.col("l_extendedprice") * F.col("l_extendedprice")).alias("price_sq"),
        # sign() returns double in Spark, integer in DuckDB → pin long
        F.signum(F.col("l_discount") - 0.05).cast("long").alias("disc_sign"),
        (F.col("l_quantity").cast("long") % 5).alias("q_mod5"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@register(
    "json_extract_events",
    tags=("functions", "json"),
    oracle="""
SELECT
  event_type,
  CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  count(*) AS n
FROM events
GROUP BY event_type
""",
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: get_json_object / from_json on the events.props
    JSON string column; integer payloads keep the hash exact."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "conditional_bucketing",
    tags=("functions", "case_when"),
    oracle="""
SELECT
  CASE WHEN o_totalprice < 50000  THEN 'small'
       WHEN o_totalprice < 150000 THEN 'medium'
       WHEN o_totalprice < 300000 THEN 'large'
       ELSE 'jumbo' END AS bucket,
  count(*)  AS n,
  count(DISTINCT o_custkey) AS n_custs
FROM orders
GROUP BY 1
""",
)
def conditional_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + per-bucket distinct counts."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return (
        o.select(bucket.alias("bucket"), "o_custkey")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("o_custkey").alias("n_custs"))
    )


@register(
    "array_funcs_suite",
    tags=("functions", "array", "higher_order"),
    oracle="""
SELECT
  vec_id,
  CAST(len(embedding) AS INT)                              AS dim,
  list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum')
                                                           AS vsum,
  CAST(list_aggregate(embedding, 'max') AS DOUBLE)         AS vmax,
  CAST(list_aggregate(embedding, 'min') AS DOUBLE)         AS vmin,
  CAST(len(list_filter(embedding, x -> x > 0)) AS INT)     AS n_pos,
  list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')
                                                           AS sumsq
FROM embeddings
WHERE vec_id <= 200
""",
)
def array_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order family on the embedding vectors: size,
    aggregate folds, filter, transform — the direct Spark image of
    oamap's per-element jitted loops (SURVEY §2.B).

    Both engines promote float32→double BEFORE arithmetic and fold
    left-to-right, so sums are bit-identical — no rounding needed (and
    rounding couldn't fix a bit-divergence anyway)."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") <= 200)
    emb = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.aggregate(emb, F.lit(0.0), lambda a, x: a + x).alias("vsum"),
        F.array_max(emb).alias("vmax"),
        F.array_min(emb).alias("vmin"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.aggregate(F.transform(emb, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
        .alias("sumsq"),
    )


@register(
    "array_mutation_suite",
    tags=("functions", "array", "mutation"),
    oracle="""
WITH base AS (
  SELECT o_orderstatus,
         [o_custkey % 10, NULL, o_orderkey % 7] AS arr
  FROM orders
), m AS (
  SELECT o_orderstatus,
         list_filter(arr, x -> x IS NOT NULL) AS compacted,
         arr[1:1] || [99] || arr[2:] AS inserted
  FROM base
)
SELECT o_orderstatus,
       CAST(sum(len(compacted)) AS BIGINT) AS sum_compact_len,
       CAST(sum(inserted[2]) AS BIGINT) AS sum_elem2,
       CAST(sum(list_position(inserted, 99)) AS BIGINT) AS sum_pos99,
       CAST(sum(len(list_prepend(0, list_append(compacted, 0)))) AS BIGINT)
         AS sum_extended_len
FROM m
GROUP BY o_orderstatus
""",
)
def array_mutation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 3.4+ array-mutation family (array_compact /
    array_insert / array_append / array_prepend / array_position) over
    per-row built arrays with an embedded NULL — all codegen'd narrow
    expressions; results reduced to per-status scalars so the driver
    hash applies. The oracle rebuilds each mutation from DuckDB list
    primitives (slicing+concat for insert, list_filter for compact)."""
    orders = load_table(spark, sf_dir, "orders")
    arr = F.array(
        F.col("o_custkey") % 10, F.lit(None).cast("long"), F.col("o_orderkey") % 7
    )
    t = orders.select(
        "o_orderstatus",
        F.array_compact(arr).alias("compacted"),
        F.array_insert(arr, 2, F.lit(99).cast("long")).alias("inserted"),
    )
    return t.groupBy("o_orderstatus").agg(
        F.sum(F.size("compacted")).alias("sum_compact_len"),
        F.sum(F.element_at("inserted", 2)).alias("sum_elem2"),
        F.sum(F.array_position("inserted", 99)).alias("sum_pos99"),
        F.sum(
            F.size(F.array_prepend(F.array_append(F.col("compacted"), 0), 0))
        ).alias("sum_extended_len"),
    )


@register(
    "string_mutation_suite",
    tags=("functions", "string", "mutation"),
    oracle="""
SELECT o_orderstatus,
       CAST(count(DISTINCT split_part(o_orderpriority, '-', 2)) AS BIGINT)
         AS n_tails,
       min(substr(o_orderpriority, 1, 2) || 'XX' || substr(o_orderpriority, 5))
         AS min_overlaid,
       min(upper(substr(o_orderpriority, 1, 1)) || lower(substr(o_orderpriority, 2)))
         AS min_initcap,
       min(lpad(o_orderpriority, 12, '_')) AS min_lpad,
       min(repeat(substr(o_orderpriority, 1, 1), 3)) AS min_rep
FROM orders
GROUP BY o_orderstatus
""",
)
def string_mutation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surgery beyond the classic suite: substring_index (tail
    after the first '-'), overlay (patch characters 3-4 with 'XX'),
    initcap, lpad, repeat — all JVM-side; the oracle rebuilds each
    from DuckDB primitives (split_part, substr concatenation,
    upper/lower casing) so the exact character semantics cross-check.
    o_orderpriority values are single words, so initcap ≡ capitalize
    first char + lowercase rest on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    p = F.col("o_orderpriority")
    return orders.groupBy("o_orderstatus").agg(
        F.count_distinct(F.substring_index(p, "-", -1)).alias("n_tails"),
        F.min(F.overlay(p, F.lit("XX"), F.lit(3))).alias("min_overlaid"),
        F.min(F.initcap(p)).alias("min_initcap"),
        F.min(F.lpad(p, 12, "_")).alias("min_lpad"),
        F.min(F.repeat(F.substring(p, 1, 1), 3)).alias("min_rep"),
    )


@register(
    "rollup_grouping_id_levels",
    tags=("agg", "rollup", "grouping_id"),
    oracle="""
SELECT coalesce(o_orderstatus, '<all>') AS status,
       coalesce(o_orderpriority, '<all>') AS priority,
       CAST(2 * GROUPING(o_orderstatus) + GROUPING(o_orderpriority) AS BIGINT)
         AS lvl,
       CAST(count(*) AS BIGINT) AS n
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
""",
)
def rollup_grouping_id_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with explicit grouping-level identification: grouping()
    bits distinguish detail rows from subtotal and grand-total rows —
    the standard warehouse idiom for rendering rollup output (NULL in
    a group key is ambiguous; the grouping bit is not). Both engines
    compute 2·g(status)+g(priority)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            (
                2 * F.grouping("o_orderstatus") + F.grouping("o_orderpriority")
            ).cast("long").alias("lvl"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "lvl",
            "n",
        )
    )


@register(
    "date_calendar_suite",
    tags=("functions", "date", "calendar"),
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(count(*) AS BIGINT) AS n,
       max(last_day(o_orderdate)) AS max_month_end,
       max(CAST(o_orderdate + INTERVAL 2 MONTH AS DATE)) AS max_plus2m,
       CAST(count(DISTINCT quarter(o_orderdate)) AS BIGINT) AS n_quarters
FROM orders
GROUP BY year(o_orderdate)
""",
)
def date_calendar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar navigation beyond the date-diff basics: last_day (end
    of month), add_months (month arithmetic with day clamping —
    identical clamp semantics in both engines), quarter. Per-year
    scalars keep the hash gate tight."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.groupBy(F.year(d).cast("long").alias("yr")).agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.last_day(d)).alias("max_month_end"),
        F.max(F.add_months(d, 2)).alias("max_plus2m"),
        F.count_distinct(F.quarter(d)).alias("n_quarters"),
    )
