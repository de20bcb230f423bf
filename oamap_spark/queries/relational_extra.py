"""Round-4 relational surface additions: lateral (correlated table)
joins and null-safe equality joins — two join semantics absent from
both oamap (no join surface at all [H]) and the earlier §2.D rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oamap_spark.queries.registry import register
from oamap_spark.sources.tables import load_table


@register(
    "lateral_top3_orders_per_customer",
    bench=True,
    tags=("join", "lateral", "correlated", "topk"),
    oracle="""
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 3
) o
WHERE c.c_mktsegment = 'BUILDING'
""",
)
def lateral_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL table subquery: for each BUILDING customer,
    its top-3 orders by price — the per-row "run a parameterized
    subquery" shape SQL:2003 calls a lateral derived table. Catalyst
    decorrelates this into a join + per-key window-group-limit (the
    same physical plan the window top-k formulation gets), so the
    declarative form costs nothing extra at 100 TB: one shuffle on the
    correlation key, limits pushed into each group. DuckDB runs the
    identical LATERAL text — both engines' decorrelation semantics are
    pinned against each other."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("__lat_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__lat_orders")
    return spark.sql(
        """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM __lat_customer c, LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM __lat_orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 3
) o
WHERE c.c_mktsegment = 'BUILDING'
"""
    )


@register(
    "nullsafe_join_event_props",
    tags=("join", "null_safe", "semantics"),
    oracle="""
WITH e AS (
  SELECT event_id, json_extract_string(props, '$.k') AS k FROM events
),
dim AS (
  SELECT DISTINCT k FROM e
)
SELECT dim.k AS k, count(*) AS n_events
FROM e JOIN dim ON e.k IS NOT DISTINCT FROM dim.k
GROUP BY dim.k
""",
)
def nullsafe_join_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): events
    keyed by a NULLABLE JSON property joined to the distinct-key dim —
    under plain `=` every null-keyed row silently drops; `<=>` makes
    null a first-class join key (one null group survives). Same
    hash-join physical plan — null-safe equality is still an equi-join
    key for Catalyst (EqualNullSafe is a valid hash key), NOT a
    fallback to nested-loop, so the 100 TB story is unchanged. The
    oracle replays with IS NOT DISTINCT FROM."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.get_json_object("props", "$.k").alias("k")
    )
    dim = ev.select("k").distinct().select(F.col("k").alias("dim_k"))
    return (
        ev.join(dim, ev["k"].eqNullSafe(dim["dim_k"]))
        .groupBy(F.col("dim_k").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "variant_props_typed_extract",
    tags=("semistructured", "variant", "json"),
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
       CAST(sum(CASE WHEN json_extract(props, '$.missing') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM events
GROUP BY event_type
""",
)
def variant_props_typed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics via Spark 4's VARIANT type: props
    parsed ONCE into a binary variant (`try_parse_json`), then typed
    path extraction (`variant_get(v, '$.k', 'bigint')`) — the modern
    replacement for per-path `get_json_object` string re-parsing. At
    100 TB the difference is real: VARIANT stores a parsed binary
    encoding, so N path extractions re-parse nothing, vs N full JSON
    string parses per row; a missing path yields NULL, not an error
    (try_ semantics). The DuckDB oracle replays with its own native
    JSON extraction."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select("event_type", F.try_parse_json("props").alias("v"))
    t = v.select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
        F.expr("variant_get(v, '$.missing', 'bigint')").alias("miss"),
    )
    return t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
        F.sum(F.when(F.col("miss").isNull(), 1).otherwise(0)).alias("n_missing"),
    )


@register(
    "try_error_handling_suite",
    tags=("functions", "try", "error_handling", "data_quality"),
    oracle="""
SELECT o_orderstatus,
       CAST(sum(TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT)) AS BIGINT)
         AS sum_pri,
       count(TRY_CAST(o_orderpriority AS BIGINT)) AS n_bad_cast_nonnull,
       round(sum(CASE WHEN o_custkey % 3 = 0 THEN NULL
                      ELSE o_totalprice / CAST(o_custkey % 3 AS DOUBLE) END), 2)
         AS sum_ratio,
       count(CASE WHEN len(string_split(o_orderpriority, '-')) >= 3
                  THEN string_split(o_orderpriority, '-')[3] END) AS n_part3,
       CAST(count(*) AS BIGINT) AS n
FROM orders
GROUP BY o_orderstatus
""",
)
def try_error_handling_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `try_` error-handling family over dirty-ish inputs: bad
    casts, division by zero, and out-of-bounds array access all yield
    NULL instead of failing the job — the data-quality posture a
    100 TB ingest needs (one malformed row must not kill a 6-hour
    stage; the NULL count IS the quality metric). try_cast parses the
    leading priority digit ('1-URGENT' → 1) but nulls the full string;
    try_divide nulls the o_custkey%3==0 rows; try_element_at nulls the
    missing third split part. The oracle replays each null-production
    rule with portable CASE/TRY_CAST semantics."""
    orders = load_table(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderstatus",
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS BIGINT)").alias(
            "pri_num"
        ),
        F.expr("try_cast(o_orderpriority AS BIGINT)").alias("bad_cast"),
        F.expr(
            "try_divide(o_totalprice, CAST(o_custkey % 3 AS DOUBLE))"
        ).alias("ratio"),
        F.expr("try_element_at(split(o_orderpriority, '-'), 3)").alias("part3"),
    )
    return t.groupBy("o_orderstatus").agg(
        F.sum("pri_num").alias("sum_pri"),
        F.count("bad_cast").alias("n_bad_cast_nonnull"),
        F.round(F.sum("ratio"), 2).alias("sum_ratio"),
        F.count("part3").alias("n_part3"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "regression_stats_suite",
    tags=("agg", "stats", "regression", "corr"),
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
       round(covar_samp(l_extendedprice, l_quantity), 4) AS covar_pq,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       arg_min(l_partkey, l_orderkey * 8 + l_linenumber) AS first_part
FROM lineitem
GROUP BY l_returnflag
""",
)
def regression_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistical aggregates per return flag: Pearson
    correlation, sample covariance, OLS slope/intercept/R² of price on
    quantity, plus a deterministic min_by (ordering key unique per
    row, so no tie ambiguity between engines). All single-pass
    map-side-partial Tungsten aggregates — the moment sums
    (Σx, Σy, Σxy, Σx², Σy²) merge associatively, so 100 TB costs one
    narrow scan + a 3-row reduce. Rounding pins the float hash; DuckDB
    computes the identical closed forms."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr(y, x), 6).alias("corr_pq"),
        F.round(F.covar_samp(y, x), 4).alias("covar_pq"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.min_by(
            "l_partkey", F.col("l_orderkey") * 8 + F.col("l_linenumber")
        ).alias("first_part"),
    )


@register(
    "crosstab_priority_status",
    tags=("stats", "crosstab", "contingency"),
    oracle="""
SELECT o_orderpriority AS o_orderpriority_o_orderstatus,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
FROM orders
GROUP BY o_orderpriority
""",
)
def crosstab_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table via DataFrameStatFunctions.crosstab — the
    exploratory pair-frequency surface (one shuffle on the row key,
    columns pivoted from the value domain). Statuses are the fixed
    TPC-H domain {F, O, P}, so the pivoted schema is stable and the
    oracle replays it as a conditional-count pivot with identical
    column names."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.stat.crosstab("o_orderpriority", "o_orderstatus")


@register(
    "csv_source_roundtrip_agg",
    tags=("source", "csv", "roundtrip"),
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 2) AS total,
       max(o_orderdate) AS last_date
FROM orders
GROUP BY o_orderstatus
""",
)
def csv_source_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source path gated end-to-end: orders written to CSV
    (header, ISO dates) and read back with an explicit schema, then
    aggregated — the oracle runs on the original parquet, so a
    value-mangling writer or parser (float precision, date format,
    delimiter quoting) breaks the hash. Spark's CSV writer emits
    shortest-round-trip doubles, so the parquet → CSV → parquet-typed
    round trip is exact. Staging is a fresh mkdtemp per invocation
    (cheap at test SF; the point is the format contract, not the
    copy)."""
    stage = _staged(sf_dir, "orders_csv")
    orders = load_table(spark, sf_dir, "orders")
    orders.write.option("header", "true").csv(stage)
    back = (
        spark.read.option("header", "true")
        .schema(orders.schema)
        .csv(stage)
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.max("o_orderdate").alias("last_date"),
    )


def _staged(sf_dir: str, leaf: str) -> str:
    """Fresh staging dir per invocation: concurrent runs of the same
    query — driver scoring alongside a local replay, or pytest-xdist —
    can never race on a shared /tmp path; roots are swept at process
    exit (sources/staging.py — ADVICE r4 #3 closed the leak)."""
    from oamap_spark.sources.staging import staged_for

    return staged_for(sf_dir, leaf)


@register(
    "xml_source_roundtrip_agg",
    tags=("source", "xml", "roundtrip"),
    oracle="""
SELECT n_regionkey,
       CAST(count(*) AS BIGINT) AS n,
       min(n_name) AS first_nation
FROM nation
GROUP BY n_regionkey
""",
)
def xml_source_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML source (Spark 4) gated end-to-end: nation written as
    <nation> row elements and read back with an explicit schema before
    aggregating — element naming, escaping, and numeric round-trip all
    sit on the hash path. The oracle runs on the original parquet."""
    stage = _staged(sf_dir, "nation_xml")
    nation = load_table(spark, sf_dir, "nation")
    nation.write.option("rootTag", "nations").option("rowTag", "nation").xml(stage)
    back = (
        spark.read.option("rowTag", "nation").schema(nation.schema).xml(stage)
    )
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("n_name").alias("first_nation"),
    )


@register(
    "orc_source_roundtrip_agg",
    tags=("source", "orc", "roundtrip"),
    oracle="""
SELECT l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1995-01-01'
GROUP BY l_linestatus
""",
)
def orc_source_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source gated end-to-end: a filtered lineitem slice written
    to ORC and read back (vectorized ORC reader), then the q6-style
    revenue fold — value fidelity across the columnar format change is
    what the hash certifies; the oracle reads the original parquet
    with the same filter."""
    stage = _staged(sf_dir, "lineitem_orc")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= "1995-01-01"
    )
    li.write.orc(stage)
    back = spark.read.orc(stage)
    return back.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


@register(
    "fromdata_union_inference_agg",
    tags=("source", "fromdata", "union", "inference"),
    oracle="""
WITH objs(name, payload_tag, payload_num, payload_str) AS (
  VALUES ('a', 0, 1.5, NULL),
         ('b', 1, NULL, 'xyz'),
         ('c', 0, 2.25, NULL),
         ('d', 1, NULL, 'pq'),
         ('e', 0, -3.0, NULL),
         ('f', 1, NULL, 'xyz')
)
SELECT payload_tag AS tag,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(CAST(COALESCE(payload_num, 0.0) AS DOUBLE)), 2) AS sum_num,
       CAST(count(DISTINCT payload_str) AS BIGINT) AS n_strs
FROM objs
GROUP BY payload_tag
""",
)
def fromdata_union_inference_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fromdata ingest path (oamap's fill) gated end-to-end,
    including UNION SYNTHESIS: six literal objects whose ``payload``
    leaf carries conflicting primitive types (double vs string) are
    inferred into the tagged-union struct(tag, v_double, v_string)
    encoding — no stringification, no data loss — then aggregated per
    variant. The oracle replays the same six objects as a VALUES table
    in their already-encoded form, so the inference + encoding +
    aggregation pipeline is what the hash certifies. Deterministic:
    the object list is a fixed literal (the ingest shape, not the
    ingest volume, is under test)."""
    from oamap_spark.sources.fill import fromdata

    objs = [
        {"name": "a", "payload": 1.5},
        {"name": "b", "payload": "xyz"},
        {"name": "c", "payload": 2.25},
        {"name": "d", "payload": "pq"},
        {"name": "e", "payload": -3.0},
        {"name": "f", "payload": "xyz"},
    ]
    df = fromdata(spark, objs)
    u = F.col("payload")
    return df.groupBy(u.getField("tag").alias("tag")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.coalesce(u.getField("v_double"), F.lit(0.0))), 2).alias(
            "sum_num"
        ),
        F.count_distinct(u.getField("v_string")).alias("n_strs"),
    )


@register(
    "parquet_partitioned_write_prune_agg",
    tags=("source", "parquet", "partitioned", "pruning"),
    oracle="""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE lang = 'en'
GROUP BY source
""",
)
def parquet_partitioned_write_prune_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet WRITE path gated end-to-end: documents
    re-written partitioned by lang (hive-style lang=.. directories),
    read back with a partition filter, aggregated — value fidelity
    through the partition-column round trip (lang leaves the file and
    comes back from the directory name) plus directory pruning on the
    read (only lang=en files are listed; partition pruning is
    separately plan-asserted in test_plans). Oracle filters the
    original parquet."""
    stage = _staged(sf_dir, "docs_by_lang")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.partitionBy("lang").parquet(stage)
    back = spark.read.parquet(stage).where(F.col("lang") == "en")
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "listagg_priorities_by_status",
    tags=("agg", "listagg", "string_agg", "ordered"),
    oracle="""
SELECT o_orderstatus,
       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
         AS priorities,
       CAST(count(*) AS BIGINT) AS n
FROM orders
GROUP BY o_orderstatus
""",
)
def listagg_priorities_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (SQL:2016 LISTAGG ... WITHIN GROUP,
    new in Spark 4): the distinct priorities of each order status
    joined in sorted order — deterministic because DISTINCT + the
    WITHIN GROUP ordering pin both membership and sequence, so the
    concatenated string hash-matches DuckDB's string_agg twin exactly.
    The distinct set per group is tiny (≤5) while the input is the
    full orders table — partial aggregation keeps the strings from
    ever being built map-side."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__la_orders")
    return spark.sql(
        """
SELECT o_orderstatus,
       listagg(DISTINCT o_orderpriority, ',')
         WITHIN GROUP (ORDER BY o_orderpriority) AS priorities,
       count(*) AS n
FROM __la_orders
GROUP BY o_orderstatus
"""
    )


@register(
    "zorder_write_filtered_agg",
    tags=("layout", "zorder", "pruning", "source"),
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
WHERE o_custkey < 500 AND o_totalprice > 50000
GROUP BY o_orderstatus
""",
)
def zorder_write_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout gated end-to-end: orders rewritten clustered
    along the (o_custkey, o_totalprice) Z-curve, then read back with a
    selective filter on BOTH clustering columns and aggregated. The
    hash certifies the curve write is value-preserving; the actual
    file-skipping payoff (per-file min/max spans materially narrower
    than a shuffled layout) stays footer-asserted in test_layout. At
    100 TB this layout is what turns either filter into a scan of a
    few files instead of all of them."""
    from oamap_spark.operators.layout import zorder_write

    stage = _staged(sf_dir, "orders_zorder")
    orders = load_table(spark, sf_dir, "orders")
    zorder_write(orders, stage, ["o_custkey", "o_totalprice"])
    back = spark.read.parquet(stage).where(
        (F.col("o_custkey") < 500) & (F.col("o_totalprice") > 50000.0)
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "zorder_incremental_filtered_agg",
    tags=("layout", "zorder", "pruning", "incremental", "maintenance",
          "source"),
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
WHERE o_custkey < 500 AND o_totalprice > 50000
GROUP BY o_orderstatus
""",
)
def zorder_incremental_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintenance-loop counterpart of ``zorder_write_filtered_agg``:
    90% of orders are laid out with the full z-order write, then the
    10% arrival batch is merged with ``zorder_incremental`` — placed
    on the table's persisted z-grid (``_zorder_meta.json``) and only
    the slice files it lands in are rewritten (untouched files stay
    byte-stable; test_layout pins that + the preserved skip fraction).
    The read-back filtered agg over BOTH clustering columns must hash-
    match the whole-table oracle — the merge lost and duplicated
    nothing. At 100 TB this is the daily OPTIMIZE that keeps pruning
    alive without rewriting the table."""
    from oamap_spark.operators.layout import zorder_incremental, zorder_write

    stage = _staged(sf_dir, "orders_zorder_incr")
    orders = load_table(spark, sf_dir, "orders")
    zorder_write(
        orders.where(F.col("o_orderkey") % 10 != 0),
        stage,
        ["o_custkey", "o_totalprice"],
    )
    zorder_incremental(
        spark, stage, orders.where(F.col("o_orderkey") % 10 == 0)
    )
    back = spark.read.parquet(stage).where(
        (F.col("o_custkey") < 500) & (F.col("o_totalprice") > 50000.0)
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "batch_session_window_stats",
    bench=True,
    tags=("session_window", "batch", "events"),
    oracle=f"""
WITH seq AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= {30 * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS is_new
  FROM events
), sess AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM seq
), per AS (
  SELECT user_id, sid, count(*) AS n_events
  FROM sess GROUP BY user_id, sid
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(max(n_events) AS BIGINT) AS max_session_events
FROM per GROUP BY user_id
""",
)
def batch_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window in BATCH mode: the same gap-merge operator the
    streaming pipeline uses (stream_user_sessions), applied to the
    events table as a plain groupBy — no watermark, every session
    finalized, which is exactly how you'd sessionize historical backfill
    data with the SAME code the live stream runs. The oracle is the
    unclipped lag-islands formulation; the streaming twin's oracle
    clips to the watermark line — comparing the two documents what
    the watermark semantics add."""
    from oamap_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    per = (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return per.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
    )


def zipf_skew_frames(spark: SparkSession, sf_dir: str):
    """The deliberately Zipf-skewed join inputs — shared (r6 review)
    by the declared ``salted_join_skewed_events`` query and bench.py's
    ``skew_zipf_join_*`` pair, so the benchmarked shape can never
    silently diverge from the verified one. 80% of event rows collapse
    onto hot key 42 (every user_id not divisible by 5); the dim side
    (customer keyed ``c_custkey % 150``) carries real multiplicity
    (~10 rows/key at sf0.01, ~100 at sf0.1)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 5 == 0, F.col("user_id"))
        .otherwise(F.lit(42))
        .alias("k"),
        "value",
    )
    dim = load_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % 150).alias("k"), "c_acctbal"
    )
    return ev, dim


@register(
    "salted_join_skewed_events",
    tags=("join", "skew", "salted"),
    oracle="""
WITH ev AS (
  SELECT CASE WHEN user_id % 5 = 0 THEN user_id ELSE 42 END AS k, value
  FROM events
), dim AS (
  SELECT c_custkey % 150 AS k, c_acctbal FROM customer
)
SELECT ev.k AS k,
       CAST(count(*) AS BIGINT) AS n_pairs,
       ROUND(SUM(ev.value), 2) AS sum_value,
       ROUND(SUM(dim.c_acctbal), 2) AS sum_acctbal
FROM ev JOIN dim ON ev.k = dim.k
GROUP BY ev.k
""",
)
def salted_join_skewed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big×big equi-join on a DELIBERATELY Zipf-skewed key through
    ``salted_join`` (operators/partitioning.py): 80% of event rows are
    collapsed onto one hot key (42), the dim side (customer, keyed
    c_custkey % 150) carries real multiplicity, and the salt spreads
    the hot key over 8 reducer sub-keys so no single task owns the
    80%·|events| × |dim-matches| pair explosion. The result is
    bit-identical to the plain join — the salt columns are internal —
    which is exactly what the oracle checks. This is the relational
    twin of the LSH `skew_500dup_*` microbench: AQE's skew-split is
    the first-line fix for sort-merge joins, explicit salting is the
    deterministic fallback that also covers hash joins and stateful
    streaming joins where AQE can't re-plan. The bench pair
    (`skew_zipf_join_salted/plain`, bench.py) records both wall
    times at sf0.1 (~8M joined pairs on the hot key)."""
    from oamap_spark.operators.partitioning import salted_join

    ev, dim = zipf_skew_frames(spark, sf_dir)
    # argument order matters (r6 review caught the inversion):
    # salted_join(big, skewed) SALTS the second arg and REPLICATES the
    # first — the hot events stream must be the salted side, the small
    # dim the salt-fold-replicated side
    j = salted_join(dim, ev, "k", salt=8)
    return j.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
    )


@register(
    "bucketed_join_colocated_agg",
    tags=("layout", "bucketing", "join", "no_shuffle"),
    oracle="""
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o.o_totalprice), 2) AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def bucketed_join_colocated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join gated end-to-end: orders and
    customer are persisted hash-bucketed (8 buckets, per-bucket
    sorted) on the join key via
    :func:`oamap_spark.operators.partitioning.write_bucketed`, read
    back through the catalog, joined on custkey, and aggregated per
    market segment. The hash certifies value fidelity through the
    bucketed write→catalog-read round trip; the actual payoff — the
    equi-join reads co-located buckets and skips the exchange
    entirely — is plan-asserted in
    tests/test_partitioning.py::test_bucketed_join_no_exchange. At
    100 TB, bucketing both fact tables on the repeatedly-joined key
    converts every such join from a full network shuffle into a local
    per-bucket merge — the durable (write-once) form of
    co-partitioning. Catalog entries are session-scoped (in-memory
    catalog; names overwritten per invocation, files staged and swept
    at process exit)."""
    from oamap_spark.operators.partitioning import write_bucketed

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    write_bucketed(
        orders, "__bkt_orders", "o_custkey", 8, _staged(sf_dir, "orders_bkt")
    )
    write_bucketed(
        customer,
        "__bkt_customer",
        "c_custkey",
        8,
        _staged(sf_dir, "customer_bkt"),
    )
    j = spark.table("__bkt_orders").join(
        spark.table("__bkt_customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "dpp_partition_prune_agg",
    tags=("layout", "partitioned", "dynamic_pruning", "join"),
    oracle="""
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars
FROM documents d
JOIN (VALUES ('en', 'high'), ('de', 'high'), ('fr', 'low'),
             ('es', 'low'), ('zh', 'low')) AS dim(lang, tier)
  ON d.lang = dim.lang
WHERE dim.tier = 'high'
GROUP BY d.lang
""",
)
def dpp_partition_prune_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning gated end-to-end: documents rewritten
    hive-partitioned by lang, then joined to a tiny tier dimension
    filtered on a NON-join column (tier='high') and aggregated. The
    partition keys that survive the dim filter are only known at run
    time, so static pushdown cannot prune — Catalyst broadcasts the
    filtered dim and re-uses the result as a partition filter on the
    fact scan (dynamicpruning subquery, plan-asserted in
    tests/test_plans.py::test_dynamic_partition_pruning_fires and
    re-asserted for this exact query in test_plans). At 100 TB with
    date/lang-partitioned facts this is the difference between
    scanning 2 of 1000 partitions and all of them. The hash certifies
    the values that flow through the pruned scan match the unpruned
    oracle exactly."""
    stage = _staged(sf_dir, "docs_by_lang_dpp")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.partitionBy("lang").parquet(stage)
    part = spark.read.parquet(stage)
    dim = spark.createDataFrame(
        [("en", "high"), ("de", "high"), ("fr", "low"), ("es", "low"),
         ("zh", "low")],
        ["lang", "tier"],
    )
    j = part.join(dim, "lang").where(F.col("tier") == "high")
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "bloom_prefilter_join_agg",
    tags=("join", "bloom", "semijoin_reduction", "scale"),
    oracle="""
SELECT l.l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY l.l_returnflag
""",
)
def bloom_prefilter_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join reduction gated end-to-end: lineitem is
    prefiltered through the Bloom hash-position set of the
    urgent-order keys (:func:`oamap_spark.operators.partitioning.
    bloom_semijoin_reduce` — distinct xxhash64 positions broadcast
    once, one LEFT SEMI broadcast hash join per hash function, all
    whole-stage codegen) BEFORE the exact join, then joined and
    aggregated per return flag. Bloom false positives are removed
    by the exact join, so the values hash-match the plain-join oracle
    bit for bit — only the shuffled row count changes. This is the
    explicit form of Spark's runtime bloom filter for the case the
    optimizer's size thresholds miss: a dim too big to broadcast as a
    hash-join side still fits as a broadcast position set, and a
    100 TB fact side sheds ~4/5 of its rows (1-URGENT selectivity) at
    the scan instead of shuffling them into the join. The pre-shuffle filter
    position is plan-asserted in
    tests/test_plans.py::test_bloom_prefilter_below_join."""
    from oamap_spark.operators.partitioning import bloom_semijoin_reduce

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    # n_bits=None auto-sizes the position space to 16× the dim key
    # count (fp ~1.4% at every SF) — a hardcoded constant would
    # silently saturate once the dim outgrows it (2^16 at 30k keys:
    # fp ~36%, half the shed — measured in bench's
    # bloom_prefilter_shuffled_rows arm)
    li_flt = bloom_semijoin_reduce(li, urgent, "l_orderkey", "o_orderkey")
    j = li_flt.join(urgent, li_flt.l_orderkey == urgent.o_orderkey)
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


@register(
    "compact_small_files_agg",
    tags=("layout", "compaction", "small_files"),
    oracle="""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang
""",
)
def compact_small_files_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction gated end-to-end: documents are first
    written as 64 deliberately tiny parquet files (the residue a
    streaming sink or frequent small appends leave behind), compacted
    by :func:`oamap_spark.operators.layout.compact` (even_sizes=True —
    deterministic round-robin, equal output files) into
    size-targeted files (~64 KiB target here so verification SFs
    produce a real multi-file layout), and the compacted table is
    re-read and aggregated per lang. The hash certifies zero rows
    lost or duplicated through the tiny-write → compact → read round
    trip — the invariant that matters, since compaction is pure
    layout surgery. File-count reduction itself is pinned in
    tests/test_layout.py::test_compact_small_files_reduces_count. At
    100 TB this is the difference between one scan task per
    kilobyte-file (footer overhead dominating) and row-group-sized
    tasks."""
    from oamap_spark.operators.layout import compact

    tiny = _staged(sf_dir, "docs_tiny_files")
    compacted = _staged(sf_dir, "docs_compacted")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(64).write.mode("overwrite").parquet(tiny)
    compact(spark, tiny, compacted, target_file_mb=64 / 1024, even_sizes=True)
    out = spark.read.parquet(compacted)
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
