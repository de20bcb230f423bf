"""Round-5 source gates: JSON-lines, text, and the npy DataSource V2
read paths, each driver-gated end-to-end (write → read-back → aggregate
vs the original-parquet oracle) — the same format-contract pattern as
the CSV/XML/ORC gates in ``relational_extra.py``. These convert the
last tests-only source components of COVERAGE.md §2.C into
driver-verified rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oamap_spark.queries.registry import register
from oamap_spark.sources.staging import staged_for as _staged
from oamap_spark.sources.tables import load_table


@register(
    "json_source_roundtrip_agg",
    tags=("source", "json", "roundtrip"),
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       -- json_extract_STRING, not json_extract: for an explicit JSON
       -- null ("k": null) DuckDB's json_extract returns a non-NULL
       -- JSON 'null' value while Spark's get_json_object returns SQL
       -- NULL; the _string form maps JSON null -> SQL NULL, matching
       -- get_json_object (ADVICE r5 #1)
       CAST(sum(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k
FROM events
GROUP BY event_type
""",
)
def json_source_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source gated end-to-end: events written as JSONL and
    read back with an explicit schema, then aggregated — key naming,
    double round-trip (Jackson shortest-representation), NULL handling
    and the nested props STRING (written as a JSON string literal, so
    escaping sits on the hash path too) are all verified against the
    original parquet. Timestamps are deliberately excluded (ts rides
    ns-exact as ts_ns elsewhere; JSON timestamp formats are a lossy
    detour, not the contract under test)."""
    stage = _staged(sf_dir, "events_json")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    ev.write.json(stage)
    back = spark.read.schema(ev.schema).json(stage)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(
            F.when(F.get_json_object("props", "$.k").isNotNull(), 1).otherwise(0)
        ).alias("n_with_k"),
    )


@register(
    "text_source_roundtrip_agg",
    tags=("source", "text", "roundtrip"),
    # The corpus is newline-free by construction (one doc = one line);
    # a doc containing '\n' would split into extra lines and fail the
    # row-count gate — fail-loud, which is the contract.
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       min(length(text)) AS min_chars,
       max(length(text)) AS max_chars,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents
""",
)
def text_source_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text source gated end-to-end: documents.text written via
    the text writer (one line per doc) and read back line-oriented,
    then character/token totals are hashed against the parquet
    original — byte fidelity of the whole-corpus round trip. This is
    the ingest shape of most raw LLM pretraining dumps (one document
    per line), and the read is trivially splittable at scale."""
    stage = _staged(sf_dir, "docs_text")
    d = load_table(spark, sf_dir, "documents").select("text")
    d.write.text(stage)
    back = spark.read.text(stage)  # column: value
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.min(F.length("value")).cast("long").alias("min_chars"),
        F.max(F.length("value")).cast("long").alias("max_chars"),
        F.sum(F.size(F.split("value", " "))).alias("total_tokens"),
    )


# Bounded staging subset for the npy gate: constant row count at every
# SF, so the driver-side fixture write is O(1), never O(data).
NPY_SUBSET = 500


@register(
    "npy_datasource_roundtrip_agg",
    tags=("source", "npy", "datasource_v2", "jagged"),
    oracle=f"""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings WHERE vec_id < {NPY_SUBSET}
)
SELECT CAST(vec_id % 5 AS BIGINT) AS grp,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(len(e)) AS BIGINT) AS total_components,
       round(sum(list_reduce(list_prepend(0.0, e), (a, x) -> a + x)), 2)
         AS sum_components
FROM v
GROUP BY 1
""",
)
def npy_datasource_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The numpy-file DataSource V2 (the engine's custom-backend
    extension point — oamap's numpyfile/ROOT analog, sources/
    npy_datasource.py) gated end-to-end: a bounded NPY_SUBSET-row
    (500) slice of embeddings is staged as the jagged offsets/content
    column pair plus a flat id column (byte-for-byte the ROOT
    jagged-branch layout), read back through
    ``spark.read.format("npy")`` in parallel range partitions, and
    aggregated against the parquet original. The fixture write
    collects a CONSTANT-size subset (vec_id < NPY_SUBSET at every SF)
    — O(1) staging, not O(data); the read path under test is the
    distributed mmap-slicing source."""
    import numpy as np

    from oamap_spark.functions import vectors as V
    from oamap_spark.sources.npy_datasource import NpyDataSource

    stage = _staged(sf_dir, "emb_npy")
    sub = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < NPY_SUBSET)
        .select("vec_id", V.as_double("embedding").alias("e"))
        .orderBy("vec_id")
    )
    rows = sub.collect()  # bounded: NPY_SUBSET rows by construction
    import os

    # exist_ok=False DELIBERATELY (ADVICE r5 #4): `stage` is a leaf of
    # a per-invocation mkdtemp, so a pre-existing dir means two
    # invocations collided on one staging root — fail loudly rather
    # than overwrite fixture files under an in-flight read. If this
    # query is ever reused outside the single-driver flow, also move
    # the NpyDataSource registration below to module import time so a
    # concurrent invocation never re-registers mid-read.
    os.makedirs(stage)
    np.save(
        os.path.join(stage, "vec_id.npy"),
        np.array([r["vec_id"] for r in rows], dtype=np.int64),
    )
    lists = [r["e"] for r in rows]
    np.save(
        os.path.join(stage, "embedding_offsets.npy"),
        np.cumsum([0] + [len(x) for x in lists]).astype(np.int64),
    )
    np.save(
        os.path.join(stage, "embedding_content.npy"),
        np.array([x for l in lists for x in l], dtype=np.float64),
    )

    spark.dataSource.register(NpyDataSource)
    back = spark.read.format("npy").load(stage)
    comp_sum = F.aggregate(
        F.col("embedding"), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        back.groupBy((F.col("vec_id") % 5).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size("embedding")).alias("total_components"),
            F.round(F.sum(comp_sum), 2).alias("sum_components"),
        )
    )
