"""Pointer & Union declared queries — oamap's two non-relational
schema nodes (SURVEY.md §2, §7.5) exercised on the driver tables.

Pointer ⇒ surrogate key + equi-join (broadcast for dims, co-partitioned
self-join for linked-list shapes). Union ⇒ struct(tag, v0..vn) encode +
tag-dispatch. Oracles replay the semantics relationally."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oamap_spark.operators import links as L
from oamap_spark.queries.registry import register
from oamap_spark.sources.tables import load_table


@register(
    "pointer_deref_supplier_nation",
    tags=("pointer", "join", "broadcast"),
    oracle="""
SELECT n.n_name AS nation,
       count(*) AS n_suppliers,
       round(avg(s.s_acctbal), 2) AS avg_acctbal
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def pointer_deref_supplier_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier.s_nationkey as an oamap Pointer into nation
    (oamap/generator.py — PointerGenerator positions deref [H]):
    resolve via broadcast equi-join, then aggregate over the fetched
    field. The fact side never shuffles for the deref itself."""
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    resolved = L.resolve_pointer(
        sup, "s_nationkey", nat, "n_nationkey", ["n_name"], broadcast=True, how="inner"
    )
    return resolved.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.avg("s_acctbal"), 2).alias("avg_acctbal"),
    )


@register(
    "pointer_self_prev_event",
    tags=("pointer", "self_join", "linked_list"),
    oracle="""
SELECT event_id,
       user_id,
       event_type,
       lag(event_type) OVER w AS prev_event_type,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
""",
)
def pointer_self_prev_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-referential Pointer (oamap linked-list shape): every event
    points at its predecessor in the per-user timeline. Mechanism is
    the honest pointer one — explicit positions + co-partitioned
    self-join on (user_id, pos-1) — which the oracle replays as lag().
    First element's pointer is null (masked pointer). Timestamps are
    compared at µs: the parquet is ns but DuckDB's view truncates to
    µs, so both sides order and subtract on `ts_ns div 1000`."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    out = L.self_pointer_prev(
        ev,
        partition_by=["user_id"],
        order_by=[F.col("ts_us"), F.col("event_id")],
        fields=["event_type", "ts_us"],
    )
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        "prev_event_type",
        (F.col("ts_us") - F.col("prev_ts_us")).alias("gap_us"),
    )


@register(
    "union_event_payload",
    tags=("union", "tagged", "dispatch"),
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(CASE
         WHEN event_type = 'purchase' THEN value
         WHEN event_type IN ('view', 'click') THEN CAST(json_extract(props, '$.k') AS BIGINT) * 0.01
         ELSE -1.0 END), 2) AS payload_score
FROM events
GROUP BY event_type
""",
)
def union_event_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union(amount: double | engagement: long | marker) over events —
    encode struct(tag, v0, v1, v2) with exactly one live slot per row
    (oamap/schema.py — Union tags array [H]), then tag-dispatch into a
    scalar. The oracle replays the dispatch as a CASE chain."""
    ev = load_table(spark, sf_dir, "events")
    tag = (
        F.when(F.col("event_type") == "purchase", 0)
        .when(F.col("event_type").isin("view", "click"), 1)
        .otherwise(2)
    )
    u = L.union_encode(
        tag,
        [
            ("amount", F.col("value")),
            ("engagement", F.get_json_object("props", "$.k").cast("long")),
            ("marker", F.col("event_id")),
        ],
    )
    dispatched = L.union_case(
        F.col("u"),
        F.col("u.amount"),
        F.col("u.engagement") * 0.01,
        F.lit(-1.0),
    )
    return (
        ev.withColumn("u", u)
        .withColumn("score", dispatched)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("score"), 2).alias("payload_score"),
        )
    )


# ---------------------------------------------------------------------------
# Recursive / self-referential schemas (SURVEY §1.3, §7.5): a Pointer
# whose target is a named ANCESTOR node — linked lists and trees. The
# worked example: a deterministic forest over `documents` (parent =
# doc_id // 10; ids < 10 are roots), i.e. the surrogate-key
# materialization of
#     node := Record({doc: ..., parent: Pointer(node, nullable)})
# Traversal is an iterative join — pointer doubling gives O(log depth)
# shuffle rounds, the plan you'd run at 100 TB, never driver-side
# recursion. The DuckDB oracle is the genuinely recursive form
# (WITH RECURSIVE), so two independent traversal strategies must agree.
# ---------------------------------------------------------------------------

def _doc_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents as a pointer forest: (doc_id, parent_id). Roots
    (doc_id < 10) carry a null parent — oamap's masked pointer."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") >= 10, F.floor(F.col("doc_id") / 10).cast("long"))
        .alias("parent_id"),
    )


@register(
    "pointer_tree_root_depth",
    tags=("pointer", "recursive", "tree", "iterative"),
    oracle="""
WITH RECURSIVE walk AS (
  SELECT doc_id, doc_id AS cur, CAST(0 AS BIGINT) AS depth FROM documents
  UNION ALL
  SELECT doc_id, cur // 10, depth + 1 FROM walk WHERE cur >= 10
)
SELECT doc_id, cur AS root_id, depth
FROM walk
WHERE cur < 10
""",
)
def pointer_tree_root_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full recursive traversal of the document forest: every node
    resolved to its root and depth via pointer doubling (O(log depth)
    rounds, operators/links.pointer_depth_root). The oracle walks the
    same forest with a recursive CTE — iterative-join and recursive
    formulations must agree row-for-row."""
    forest = _doc_forest(spark, sf_dir)
    out = L.pointer_depth_root(forest, "doc_id", "parent_id")
    return out.select(
        F.col("node").alias("doc_id"),
        "root_id",
        F.col("depth").cast("long").alias("depth"),
    )


@register(
    "pointer_tree_grandparent",
    tags=("pointer", "recursive", "tree", "iterate_n"),
    oracle="""
SELECT doc_id,
       CASE WHEN doc_id >= 100 THEN doc_id // 100 END AS ancestor_id
FROM documents
""",
)
def pointer_tree_grandparent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-step traversal: each document's 2-step ancestor via
    iterate_pointer (binary-decomposed jump joins). Walking off a root
    yields null — the masked-pointer convention. The oracle is the
    closed form of parent∘parent on this forest."""
    forest = _doc_forest(spark, sf_dir)
    return L.iterate_pointer(forest, "doc_id", "parent_id", 2).select(
        "doc_id", "ancestor_id"
    )


@register(
    "pointer_chain_depth_root",
    tags=("pointer", "recursive", "chain", "deep", "iterative"),
    oracle="""
WITH RECURSIVE walk AS (
  SELECT doc_id, doc_id AS cur, CAST(0 AS BIGINT) AS depth
  FROM documents WHERE doc_id < 400
  UNION ALL
  SELECT doc_id, cur - 1, depth + 1 FROM walk WHERE cur > 0
)
SELECT doc_id, cur AS root_id, depth
FROM walk
WHERE cur = 0
""",
)
def pointer_chain_depth_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEEP recursive traversal: a 400-node linked list (parent =
    doc_id − 1 over doc_id < 400; node 0 is the root) resolved to
    root + depth by pointer doubling. The document FOREST maxes out at
    depth 3 at test SF, so `pointer_tree_root_depth` exercises only a
    couple of doubling rounds; this chain forces ⌈log₂ 400⌉ ≈ 9 rounds
    — the O(log diameter) loop working at real depth, exactly the
    regime (deep chains) where doubling beats the recursive CTE's
    depth-many sequential self-joins. The DuckDB oracle IS that
    recursive form (O(n·depth) intermediate rows at this size), so the
    two traversal strategies must agree at depth 399."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    chain = d.select(
        "doc_id",
        F.when(F.col("doc_id") > 0, F.col("doc_id") - 1).alias("parent_id"),
    )
    out = L.pointer_depth_root(chain, "doc_id", "parent_id")
    return out.select(
        F.col("node").alias("doc_id"),
        "root_id",
        F.col("depth").cast("long").alias("depth"),
    )


@register(
    "union_tagged_dispatch_events",
    tags=("union", "schema", "dispatch"),
    oracle="""
WITH u AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS tag,
         CASE WHEN event_type = 'purchase' THEN value END AS v_0,
         CASE WHEN event_type <> 'purchase' THEN event_type END AS v_1
  FROM events
)
SELECT tag,
       count(*) AS n,
       round(sum(v_0), 2) AS sum_amount,
       CAST(count(DISTINCT v_1) AS BIGINT) AS n_text_kinds
FROM u
GROUP BY tag
""",
)
def union_tagged_dispatch_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Union node end-to-end on real data: events become a
    ``Union([amount: double, kind: string])`` — purchases carry a
    numeric payload (variant 0), everything else its type name
    (variant 1) — via links.union_encode (struct(tag, v_0, v_1), one
    live slot per row), then are dispatched back by tag and aggregated
    per variant. Physically the union is just three narrow columns
    (nulls compress to bitmaps in parquet), so the encoding costs
    nothing at scale; the when-chain dispatch stays in codegen.
    Converts the §2.B Union surface from tests-only to oracle-gated."""
    from oamap_spark.operators.links import union_encode

    ev = load_table(spark, sf_dir, "events")
    tag = F.when(F.col("event_type") == "purchase", 0).otherwise(1)
    u = ev.select(
        union_encode(
            tag,
            [
                ("v_0", F.col("value")),
                ("v_1", F.col("event_type")),
            ],
        ).alias("u")
    )
    return (
        u.groupBy(F.col("u.tag").alias("tag"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("u.v_0"), 2).alias("sum_amount"),
            F.count_distinct(F.col("u.v_1")).alias("n_text_kinds"),
        )
    )


@register(
    "recursive_cte_subtree_stats",
    bench=True,
    tags=("pointer", "recursive", "tree", "recursive_cte", "sql"),
    oracle="""
WITH RECURSIVE walk AS (
  SELECT doc_id, doc_id AS cur, CAST(0 AS BIGINT) AS depth FROM documents
  UNION ALL
  SELECT doc_id, cur // 10, depth + 1 FROM walk WHERE cur >= 10
)
SELECT cur AS root_id,
       count(*) AS n_nodes,
       max(depth) AS max_depth
FROM walk
WHERE cur < 10
GROUP BY cur
""",
)
def recursive_cte_subtree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-root subtree size and height via Spark 4's native
    ``WITH RECURSIVE`` — the SQL-recursion face of the recursive-schema
    story: the same document forest the pointer-doubling operators
    walk (`pointer_tree_root_depth`), traversed by the engine's own
    iterative union (each recursion step is one self-join stage, state
    = the frontier — the declarative twin of links.iterate_pointer's
    jump joins). The DuckDB oracle runs the identical recursion, so
    both engines' recursive-CTE semantics are pinned against each
    other. At scale the frontier shrinks geometrically with depth;
    pointer doubling (O(log d) rounds) remains the better plan for
    deep chains, which is why both forms ship."""
    docs = load_table(spark, sf_dir, "documents")
    docs.select("doc_id").createOrReplaceTempView("__oamap_tree_docs")
    return spark.sql(
        """
WITH RECURSIVE walk AS (
  SELECT doc_id, doc_id AS cur, CAST(0 AS BIGINT) AS depth
  FROM __oamap_tree_docs
  UNION ALL
  SELECT doc_id, cur DIV 10, depth + 1 FROM walk WHERE cur >= 10
)
SELECT cur AS root_id,
       count(*) AS n_nodes,
       max(depth) AS max_depth
FROM walk
WHERE cur < 10
GROUP BY cur
"""
    )
