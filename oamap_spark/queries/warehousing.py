"""Warehousing-pattern queries: MERGE-style upsert (SCD type 1),
slowly-changing-dimension interval building (SCD type 2), and TF-IDF
term scoring (SURVEY §2.D widening — the mutation/history idioms every
lakehouse pipeline needs, expressed as pure relational plans)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oamap_spark.queries.registry import register
from oamap_spark.sources.tables import load_table


@register(
    "merge_upsert_scd1",
    tags=("merge", "upsert", "scd1"),
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
updates AS (
  SELECT o_orderkey AS k, 'U' AS new_status,
         (cents * 101) // 100 AS new_cents
  FROM base WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey + 10000000 AS k, 'I' AS new_status,
         cents // 2 AS new_cents
  FROM base WHERE o_orderkey % 1000 = 0
),
merged AS (
  SELECT coalesce(u.k, o.o_orderkey) AS o_orderkey,
         coalesce(u.new_status, o.o_orderstatus) AS status,
         coalesce(u.new_cents, o.cents) AS cents,
         CASE WHEN u.k IS NULL THEN 'kept'
              WHEN o.o_orderkey IS NULL THEN 'inserted'
              ELSE 'updated' END AS action
  FROM base o FULL OUTER JOIN updates u ON o.o_orderkey = u.k
)
SELECT action, count(*) AS n, CAST(sum(cents) AS BIGINT) AS total_cents
FROM merged GROUP BY action
""",
)
def merge_upsert_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (SCD type 1) as a pure plan: WHEN MATCHED
    THEN UPDATE, WHEN NOT MATCHED THEN INSERT — a FULL OUTER join on
    the key with field-wise coalesce (updates win). The updates side
    here is a deterministic transform of the base itself (every 10th
    key updated, every 1000th key re-inserted under a shifted key).
    One shuffle on the merge key; at 100 TB both sides bucket/sort on
    the key and the join is co-located. Money stays in integer cents
    throughout (float round at the half-cent boundary diverges between
    engines — observed on the *0.5 inserts at sf0.01). Emits the
    per-action audit counts a MERGE statement would report."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    updates = (
        o.where(F.col("o_orderkey") % 10 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.lit("U").alias("new_status"),
            F.expr("(cents * 101) div 100").alias("new_cents"),
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 1000 == 0).select(
                (F.col("o_orderkey") + 10_000_000).alias("k"),
                F.lit("I").alias("new_status"),
                F.expr("cents div 2").alias("new_cents"),
            )
        )
    )
    merged = (
        o.join(updates, o.o_orderkey == updates.k, "full_outer")
        .select(
            F.coalesce(updates.k, o.o_orderkey).alias("o_orderkey"),
            F.coalesce(F.col("new_status"), o.o_orderstatus).alias("status"),
            F.coalesce(F.col("new_cents"), o.cents).alias("cents"),
            F.when(updates.k.isNull(), "kept")
            .when(o.o_orderkey.isNull(), "inserted")
            .otherwise("updated")
            .alias("action"),
        )
    )
    return merged.groupBy("action").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("total_cents"),
    )


@register(
    "scd2_intervals_from_events",
    tags=("scd2", "window", "intervals"),
    oracle="""
WITH e AS (
  SELECT user_id, event_id, event_type,
         make_timestamp(epoch_ns(ts) // 1000) AS tsu
  FROM events
),
marked AS (
  SELECT user_id, event_type, tsu, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                   OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS is_start
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
),
starts AS (
  SELECT user_id, event_type, tsu AS valid_from, event_id,
         lead(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id)
           AS valid_to
  FROM marked WHERE is_start = 1
)
SELECT user_id, event_type, valid_from, valid_to
FROM starts
""",
)
def scd2_intervals_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: collapse each user's event stream into
    validity intervals — a new interval opens whenever the event_type
    CHANGES (lag comparison), closes when the next interval opens
    (lead), NULL valid_to = current. Two window passes over one
    shuffle on user_id; (ts, event_id) ordering makes interval
    boundaries deterministic under timestamp ties."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type"))
        )
        .cast("int")
        .alias("is_start"),
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    starts = marked.where(F.col("is_start") == 1).select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        "event_id",
        F.lead("ts").over(
            Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
        ).alias("valid_to"),
    )
    return starts.select("user_id", "event_type", "valid_from", "valid_to")


@register(
    "doc_tfidf_top_terms",
    tags=("llm", "text", "tfidf"),
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln(n.n_docs / CAST(df.df AS DOUBLE)), 6) AS tfidf
  FROM tf JOIN df ON tf.term = df.term, n
),
ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, term, tfidf, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3
""",
)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document: term frequencies (one
    token-explode shuffle), document frequencies (vocabulary-sized →
    BROADCAST back onto tf), score = tf·ln(N/df), per-doc top-k via
    window-group-limit. Ranking tie-broken by term so the top set is
    deterministic. The same plan at 100 TB: the only big shuffle is
    the (doc, term) aggregation."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = tok.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df").cast("double")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "term", "tfidf", "rnk")
    )
