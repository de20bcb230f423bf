"""Similarity-search declared queries on `embeddings` (LLM-pipeline
surface): brute-force cosine top-k baseline + LSH-bucketed ANN scale
path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oamap_spark.functions import vectors as V
from oamap_spark.queries.registry import register
from oamap_spark.sources.tables import load_table

N_QUERIES = 10  # vec_id 0..9 are the query vectors
TOP_K = 5

_A = V.SQL_AS_DOUBLE.format(col="q.embedding")
_B = V.SQL_AS_DOUBLE.format(col="c.embedding")


@register(
    "cosine_topk_bruteforce",
    tags=("llm", "similarity", "cosine", "topk"),
    bench=True,
    oracle=f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_QUERIES}),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         {V.SQL_DOT.format(a=_A, b=_B)}
           / (sqrt({V.SQL_SUMSQ.format(a=_A)}) * sqrt({V.SQL_SUMSQ.format(a=_B)}))
           AS cos_sim
  FROM q, c
)
SELECT query_id, cand_id, cos_sim,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, cand_id) AS BIGINT) AS rnk
FROM pairs
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) <= {TOP_K}
""",
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (small) query set
    against the candidate corpus — a single narrow pass over the
    candidates, then per-query top-k via window (window-group-limit
    keeps only k rows per partition). This is the exact baseline every
    ANN variant is measured against; at 100 TB the same plan holds
    because the broadcast side is the query set, never the corpus."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), V.as_double("embedding").alias("qv")
    )
    c = e.where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("cand_id"), V.as_double("embedding").alias("cv")
    )
    pairs = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "cand_id",
        V.cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TOP_K)
    )


# Deterministic ±1 hyperplane signs: component c of plane p in table t
# flips on the parity of a small LCG — fixed constants, reproducible
# anywhere. Multi-table LSH (L tables × k planes): collision prob per
# table p_t = Π(1 - θᵢ/π); any-table prob = 1-(1-p_t)^L — L tables buy
# recall without widening any single bucket.
N_TABLES = 8
N_PLANES = 4
DIM = 64


def _plane_sign(t: int, p: int, c: int) -> int:
    v = (1103515245 * ((t * 64 + p) * DIM + c + 1) + 12345) % 2147483648
    return 1 if (v >> 16) & 1 else -1


_SIGNS = [
    [[_plane_sign(t, p, c) for c in range(DIM)] for p in range(N_PLANES)]
    for t in range(N_TABLES)
]


@register(
    "ann_lsh_topk",
    tags=("llm", "similarity", "ann", "lsh"),
    # random-hyperplane bucketing is engine-internal; correctness is
    # the recall assertion in tests → rows-only gate here.
    oracle=None,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via multi-table random-hyperplane LSH: 8 tables × 4-bit sign
    buckets; candidates = bucket match in ANY table (plus Hamming-1
    multi-probe on the query side), then exact cosine + top-k within
    candidates. At scale the (table, bucket) equi-join replaces the
    full cross product; recall vs brute force is asserted in tests."""
    e = load_table(spark, sf_dir, "embeddings")

    def bucket_struct(t: int, vcol):
        bits = []
        for p in range(N_PLANES):
            signs = _SIGNS[t][p]
            proj = F.aggregate(
                F.zip_with(
                    vcol,
                    F.array(*[F.lit(float(s)) for s in signs]),
                    lambda x, s: x * s,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return F.struct(F.lit(t).alias("tbl"), out.alias("bkt"))

    def all_buckets(vcol):
        return F.array(*[bucket_struct(t, vcol) for t in range(N_TABLES)])

    base = e.select("vec_id", V.as_double("embedding").alias("v")).withColumn(
        "buckets", all_buckets(F.col("v"))
    )
    c = (
        base.where(F.col("vec_id") >= N_QUERIES)
        .select(
            F.col("vec_id").alias("cand_id"),
            F.col("v").alias("cv"),
            F.explode("buckets").alias("b"),
        )
        .select("cand_id", "cv", F.col("b.tbl").alias("tbl"), F.col("b.bkt").alias("bkt"))
    )
    # query side: every table bucket + its Hamming-1 probes
    q = (
        base.where(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.explode("buckets").alias("b"),
        )
        .select(
            "query_id",
            "qv",
            F.col("b.tbl").alias("tbl"),
            F.explode(
                F.array(
                    F.col("b.bkt"),
                    *[F.col("b.bkt").bitwiseXOR(F.lit(1 << p)) for p in range(N_PLANES)],
                )
            ).alias("bkt"),
        )
    )
    pairs = (
        q.join(c, ["tbl", "bkt"])
        .select("query_id", "qv", "cand_id", "cv")
        .distinct()  # a pair may collide in several tables
        .select(
            "query_id", "cand_id", V.cosine(F.col("qv"), F.col("cv")).alias("cos_sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TOP_K)
    )


@register(
    "dedup_embedding_cosine",
    tags=("llm", "dedup", "embedding", "cosine"),
    oracle=f"""
WITH v AS (
  SELECT vec_id, {V.SQL_AS_DOUBLE.format(col='embedding')} AS e FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({V.SQL_DOT.format(a='a.e', b='b.e')}
         / (sqrt({V.SQL_SUMSQ.format(a='a.e')}) * sqrt({V.SQL_SUMSQ.format(a='b.e')})), 6)
         AS cos_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE {V.SQL_DOT.format(a='a.e', b='b.e')}
      / (sqrt({V.SQL_SUMSQ.format(a='a.e')}) * sqrt({V.SQL_SUMSQ.format(a='b.e')})) >= 0.99
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: pairs with cosine ≥ 0.99 — the
    semantic-duplicate detector of the dedup family. Exact all-pairs
    form (the oracle-checkable ground truth); the scale path reuses
    the ann LSH/IVF bucketing so only same-bucket pairs are scored,
    exactly as dedup_minhash_lsh bounds the candidate set for text."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", V.as_double("embedding").alias("e"))
    a, b = v.alias("a"), v.alias("b")
    cos = V.cosine(F.col("a.e"), F.col("b.e"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .where(cos >= 0.99)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )


# IVF coarse quantizer: the first N_CENTROIDS corpus vectors serve as
# deterministic centroids (a real deployment trains k-means; the
# assignment/probe plan is identical and that is what's under test).
N_CENTROIDS = 16
N_PROBES = 8


def _centroids(e: DataFrame) -> DataFrame:
    return e.where(F.col("vec_id") < N_QUERIES + N_CENTROIDS).where(
        F.col("vec_id") >= N_QUERIES
    ).select(
        (F.col("vec_id") - N_QUERIES).alias("cid"),
        V.as_double("embedding").alias("cv"),
    )


def _assign(df: DataFrame, vcol: str, cents: DataFrame, k: int) -> DataFrame:
    """Nearest-k centroid assignment via broadcast cross join + window
    rank on cosine — narrow over the corpus, centroids broadcast."""
    cos = V.cosine(F.col(vcol), F.col("cv"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        df.crossJoin(F.broadcast(cents))
        .select(df["*"], F.col("cid"), cos.alias("sim"))
        .withColumn("crnk", F.row_number().over(w))
        .where(F.col("crnk") <= k)
        .drop("sim", "crnk")
    )


@register(
    "ivf_centroid_assignment",
    tags=("llm", "similarity", "ann", "ivf"),
    oracle=f"""
WITH v AS (
  SELECT vec_id, {V.SQL_AS_DOUBLE.format(col='embedding')} AS e FROM embeddings
), cents AS (
  SELECT vec_id - {N_QUERIES} AS cid, e AS cv FROM v
  WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_CENTROIDS}
), scored AS (
  SELECT v.vec_id, cents.cid,
         {V.SQL_DOT.format(a='v.e', b='cents.cv')}
           / (sqrt({V.SQL_SUMSQ.format(a='v.e')}) * sqrt({V.SQL_SUMSQ.format(a='cents.cv')}))
           AS sim
  FROM v, cents
  WHERE v.vec_id >= {N_QUERIES}
), best AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rnk
  FROM scored
)
SELECT cid, count(*) AS bucket_size
FROM best WHERE rnk = 1
GROUP BY cid
""",
)
def ivf_centroid_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: every corpus vector joins its nearest
    centroid's inverted list (broadcast centroids — the corpus never
    shuffles for assignment). Emits bucket sizes; the oracle replays
    the argmax-cosine assignment."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = _centroids(e)
    corpus = e.where(F.col("vec_id") >= N_QUERIES).select(
        "vec_id", V.as_double("embedding").alias("v")
    )
    assigned = _assign(corpus, "v", cents, 1)
    return assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("bucket_size"))


@register(
    "ann_ivf_topk",
    tags=("llm", "similarity", "ann", "ivf"),
    # bucketed search path — recall vs brute force asserted in tests;
    # rows-only gate (same policy as ann_lsh_topk).
    oracle=None,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search: corpus vectors live in their nearest centroid's
    list; each query probes its N_PROBES nearest centroids and scores
    only those lists — the (cid) equi-join replaces the cross product
    at scale. Exact cosine + top-k within the probed lists."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = _centroids(e)
    corpus = _assign(
        e.where(F.col("vec_id") >= N_QUERIES).select(
            "vec_id", V.as_double("embedding").alias("v")
        ),
        "v",
        cents,
        1,
    ).select(F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"), "cid")
    probes = _assign(
        e.where(F.col("vec_id") < N_QUERIES).select(
            "vec_id", V.as_double("embedding").alias("v")
        ),
        "v",
        cents,
        N_PROBES,
    ).select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "cid")
    pairs = probes.join(corpus, "cid").select(
        "query_id", "cand_id", V.cosine(F.col("qv"), F.col("cv")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TOP_K)
    )


@register(
    "embedding_label_stats",
    tags=("llm", "similarity", "stats"),
    oracle=f"""
SELECT label,
       count(*) AS n,
       CAST(sum(CASE WHEN sqrt({V.SQL_SUMSQ.format(a=V.SQL_AS_DOUBLE.format(col='embedding'))})
                          BETWEEN 0.99 AND 1.01 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unit_norm,
       min(vec_id) AS min_vec_id
FROM embeddings
GROUP BY label
""",
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label corpus stats incl. unit-norm count (embeddings are
    L2-normalized ⇒ dot == cosine; documented invariant the ANN path
    relies on)."""
    e = load_table(spark, sf_dir, "embeddings")
    nrm = V.norm(V.as_double("embedding"))
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(nrm.between(0.99, 1.01), 1).otherwise(0)).alias("n_unit_norm"),
        F.min("vec_id").alias("min_vec_id"),
    )
