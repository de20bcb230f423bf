"""Text-analysis declared queries on `documents` (LLM-pipeline
surface; beyond the reference — SURVEY §2.D last row / §7.6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oamap_spark.functions import text as X
from oamap_spark.queries.registry import register
from oamap_spark.sources.tables import load_table

STOPWORDS = ("the", "a", "of", "and", "to")
_SW_SQL = "['the', 'a', 'of', 'and', 'to']"


@register(
    "doc_token_stats",
    tags=("llm", "text", "tokens"),
    bench=True,
    oracle="""
SELECT
  doc_id,
  CAST(len(string_split(text, ' ')) AS INT)                 AS n_tokens,
  CAST(len(list_distinct(string_split(text, ' '))) AS INT)  AS n_unique,
  CAST(length(text) AS BIGINT)                              AS n_chars_m,
  CAST(length(replace(text, ' ', '')) AS BIGINT)            AS n_alpha,
  CAST(len(list_filter(string_split(text, ' '), t -> length(t) >= 6)) AS INT)
                                                            AS n_long_tokens
FROM documents
""",
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per document — whitespace tokens, uniques, char
    counts, long-token counts. All codegen'd array ops, narrow."""
    d = load_table(spark, sf_dir, "documents")
    toks = X.tokens("text")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.length("text").cast("long").alias("n_chars_m"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("long").alias("n_alpha"),
        F.size(F.filter(toks, lambda t: F.length(t) >= 6)).alias("n_long_tokens"),
    )


@register(
    "doc_quality_scores",
    tags=("llm", "text", "quality"),
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks, length(text) AS nc
  FROM documents
)
SELECT doc_id, lang,
  CAST(len(toks) AS INT) AS n_tokens,
  CAST(len(list_filter(toks, x -> list_contains({_SW_SQL}, x))) AS DOUBLE)
    / len(toks)                                            AS stop_ratio,
  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)     AS ttr,
  CAST(nc AS DOUBLE) / len(toks)                           AS chars_per_token,
  (CASE WHEN len(toks) BETWEEN 20 AND 400 THEN 1 ELSE 0 END
   + CASE WHEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) > 0.3
          THEN 1 ELSE 0 END
   + CASE WHEN CAST(len(list_filter(toks, x -> list_contains({_SW_SQL}, x))) AS DOUBLE)
               / len(toks) BETWEEN 0.02 AND 0.4 THEN 1 ELSE 0 END)
                                                           AS quality_score
FROM t
""",
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, type-token ratio, chars/token,
    and a 0–3 integer quality score from range checks (the standard
    pre-training filter signals)."""
    d = load_table(spark, sf_dir, "documents")
    toks = X.tokens("text")
    n = F.size(toks)
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("double") / n
    )
    ttr = F.size(F.array_distinct(toks)).cast("double") / n
    cpt = F.length("text").cast("double") / n
    score = (
        F.when(n.between(20, 400), 1).otherwise(0)
        + F.when(ttr > 0.3, 1).otherwise(0)
        + F.when(stop_ratio.between(0.02, 0.4), 1).otherwise(0)
    )
    return d.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        ttr.alias("ttr"),
        cpt.alias("chars_per_token"),
        score.alias("quality_score"),
    )


@register(
    "lang_id_ngram_heuristic",
    tags=("llm", "text", "langid"),
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
), feat AS (
  SELECT doc_id, lang,
    CAST(len(list_filter(toks, x -> list_contains({_SW_SQL}, x))) AS DOUBLE)
      / len(toks) AS stop_ratio
  FROM t
)
SELECT lang,
  count(*) AS n_docs,
  CAST(sum(CASE WHEN stop_ratio >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS pred_en,
  CAST(sum(CASE WHEN stop_ratio <  0.05 THEN 1 ELSE 0 END) AS BIGINT) AS pred_other
FROM feat
GROUP BY lang
""",
)
def lang_id_ngram_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: English-stopword density classifier,
    confusion counts against the labeled `lang` column. (The synthetic
    corpus shares one vocabulary across langs, so this measures the
    plumbing, not linguistics — the operator shape is the deliverable.)
    """
    d = load_table(spark, sf_dir, "documents")
    toks = X.tokens("text")
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("double")
        / F.size(toks)
    )
    feat = d.select("doc_id", "lang", stop_ratio.alias("stop_ratio"))
    return feat.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("stop_ratio") >= 0.05, 1).otherwise(0)).alias("pred_en"),
        F.sum(F.when(F.col("stop_ratio") < 0.05, 1).otherwise(0)).alias("pred_other"),
    )


@register(
    "doc_fingerprint_rolling",
    tags=("llm", "text", "fingerprint"),
    oracle=f"""
SELECT doc_id,
       {X.SQL_FINGERPRINT.format(col='text')} AS fp,
       CAST(length(text) AS BIGINT) AS n_chars_m
FROM documents
""",
)
def doc_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive polynomial rolling-hash fingerprint over the
    token stream (mod 2^31-1) — portable to the oracle; detects exact
    token-sequence duplicates regardless of doc_id."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        X.fingerprint("text").alias("fp"),
        F.length("text").cast("long").alias("n_chars_m"),
    )


@register(
    "doc_fingerprint_native",
    tags=("llm", "text", "fingerprint", "native"),
    # xxhash64 VALUES are Spark-specific, but the duplicate GROUPS they
    # induce are engine-neutral (hash equality ⇔ text equality absent
    # collisions, vanishingly improbable at 2⁻⁶⁴ on this corpus) — so
    # the query emits each doc's canonical group representative and
    # the oracle replays the grouping on the raw text. Rows-only →
    # oracle-gated conversion (round 4); hash-value equivalence with
    # the portable rolling fingerprint stays pinned in tests.
    oracle="""
SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS group_min_doc
FROM documents
""",
)
def doc_fingerprint_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native fingerprint (xxhash64 over the token stream) —
    the production hot path: one JVM hash op, no hex round-trip. The
    declared output is the induced duplicate grouping (each doc's
    minimum-id groupmate): at 100 TB the 8-byte fp64 is the shuffle
    key — the full text never leaves the scan — while the result is
    engine-neutral and oracle-checkable."""
    d = load_table(spark, sf_dir, "documents")
    fp = d.select("doc_id", X.fingerprint_native("text").alias("fp64"))
    w = Window.partitionBy("fp64")
    return fp.select(
        "doc_id", F.min("doc_id").over(w).alias("group_min_doc")
    )


@register(
    "doc_top_bigrams",
    tags=("llm", "text", "ngram", "topk"),
    oracle="""
WITH t AS (
  SELECT string_split(text, ' ') AS tk FROM documents
), grams AS (
  SELECT unnest([tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))]) AS bigram
  FROM t WHERE len(tk) >= 2
)
SELECT bigram, count(*) AS n
FROM grams
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 20
""",
)
def doc_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams: per-doc bigram arrays (narrow) →
    explode → count → top-k (TakeOrdered, no global sort). Ties break
    on the bigram text so the limit is deterministic."""
    d = load_table(spark, sf_dir, "documents")
    # Project tokens first: element_at inside the transform lambda
    # re-evaluates its argument subtree, so an inline split() would
    # re-tokenize per bigram (see functions/text.combine_shingle_ids).
    toks = F.col("tk")
    grams = d.select(X.tokens("text").alias("tk")).select(
        F.explode(
            F.when(
                F.size(toks) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram")
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@register(
    "doc_lang_source_profile",
    tags=("llm", "text", "metadata"),
    oracle="""
SELECT lang, source,
       count(*) AS n_docs,
       round(avg(n_chars), 2) AS avg_chars,
       min(doc_id) AS min_doc_id
FROM documents
GROUP BY lang, source
""",
)
def doc_lang_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition profile by language × source — the first
    query every training-data pipeline runs before sampling weights."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.min("doc_id").alias("min_doc_id"),
    )


@register(
    "doc_repetition_signals",
    bench=True,
    tags=("llm", "text", "quality", "repetition"),
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
), g AS (
  SELECT doc_id, toks, n,
    list_transform(range(1, n), i -> toks[i] || ' ' || toks[i+1]) AS bigr,
    list_transform(range(1, n - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS trigr
  FROM t
)
SELECT doc_id,
  CAST(n AS INT) AS n_tokens,
  CAST(list_max(list_transform(list_distinct(toks),
       w -> len(list_filter(toks, x -> x = w)))) AS DOUBLE) / n AS top_token_frac,
  CASE WHEN len(bigr) > 0
       THEN 1.0 - CAST(len(list_distinct(bigr)) AS DOUBLE) / len(bigr)
       ELSE 0.0 END AS dup_bigram_frac,
  CASE WHEN len(trigr) > 0
       THEN 1.0 - CAST(len(list_distinct(trigr)) AS DOUBLE) / len(trigr)
       ELSE 0.0 END AS dup_trigram_frac
FROM g
""",
)
def doc_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher/MassiveText rules:
    fraction of tokens in the most common token, duplicate 2-/3-gram
    fractions). Everything is a narrow per-row array expression — no
    explode, no shuffle, whole-stage codegen end to end, so the plan is
    a single parquet-scan→project pass at any corpus size. The
    most-common-token count is O(distinct×n) per row, bounded by doc
    (or chunk) length, in exchange for staying shuffle-free — the
    explode+groupBy alternative would shuffle every (doc, token) pair."""
    d = load_table(spark, sf_dir, "documents")
    toks = X.tokens("text")
    n = F.size(toks)
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda w: F.size(F.filter(toks, lambda x: x == w)),
        )
    )
    big_a = F.slice(toks, 1, F.greatest(n - 1, F.lit(0)))
    big_b = F.slice(toks, 2, F.greatest(n - 1, F.lit(0)))
    bigr = F.zip_with(big_a, big_b, lambda a, b: F.concat_ws(" ", a, b))
    tri_len = F.greatest(n - 2, F.lit(0))
    trigr = F.zip_with(
        F.zip_with(
            F.slice(toks, 1, tri_len),
            F.slice(toks, 2, tri_len),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        F.slice(toks, 3, tri_len),
        lambda ab, c: F.concat_ws(" ", ab, c),
    )

    def dup_frac(arr):
        return F.when(
            F.size(arr) > 0,
            F.lit(1.0) - F.size(F.array_distinct(arr)).cast("double") / F.size(arr),
        ).otherwise(F.lit(0.0))

    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        (top_cnt.cast("double") / n).alias("top_token_frac"),
        dup_frac(bigr).alias("dup_bigram_frac"),
        dup_frac(trigr).alias("dup_trigram_frac"),
    )


@register(
    "dominant_source_per_lang",
    tags=("llm", "text", "mode", "window"),
    oracle="""
SELECT lang, source AS dominant_source, CAST(n AS BIGINT) AS n_docs
FROM (
  SELECT lang, source, count(*) AS n,
         row_number() OVER (PARTITION BY lang
                            ORDER BY count(*) DESC, source) AS rn
  FROM documents GROUP BY lang, source
)
WHERE rn = 1
""",
)
def dominant_source_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: the most common source per language, ties
    broken lexicographically (a bare mode() aggregate is
    tie-nondeterministic across engines — this shape is reproducible
    anywhere). Count-then-top-1: the window input is already
    group-sized, so the rank pass is dimension-scale."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("source"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "lang",
            F.col("source").alias("dominant_source"),
            F.col("n").cast("long").alias("n_docs"),
        )
    )


@register(
    "heavy_hitter_terms",
    bench=True,
    tags=("llm", "text", "heavy_hitters", "misra_gries"),
    oracle="""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS item FROM documents
),
tot AS (SELECT count(*) AS n FROM toks)
SELECT item, CAST(count(*) AS BIGINT) AS cnt
FROM toks, tot
GROUP BY item, tot.n
HAVING count(*) >= ceiling(0.002 * n)
""",
)
def heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-dominating terms (count ≥ 0.2% of all tokens) — the
    stopword/boilerplate-discovery question — via the two-pass
    Misra–Gries operator (operators/heavyhitters.py): per-partition
    capacity-512 summaries yield a GUARANTEED candidate superset
    (0.002 ≥ 1/513), then exact counts verify candidates only. The
    output is bit-identical to the full GROUP BY + HAVING the oracle
    runs, but at 100 TB only ≤ 512·P candidate keys leave the
    partitions instead of every distinct term of the corpus."""
    from oamap_spark.operators.heavyhitters import heavy_hitters

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("item"))
    return heavy_hitters(toks, "item", 0.002, capacity=512)


@register(
    "corpus_snapshot_drift",
    tags=("llm", "text", "drift", "monitoring"),
    oracle="""
WITH tok AS (
  SELECT CAST(substring(source, 4) AS INT) < 10 AS is_a,
         unnest(string_split(text, ' ')) AS token
  FROM documents
), counts AS (
  SELECT token,
         sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS n_a,
         sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS n_b
  FROM tok GROUP BY token
), tot AS (
  SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb
  FROM counts
)
SELECT token,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST(floor(100000 * 0.5 * (
         CASE WHEN n_a > 0
              THEN (n_a / ta) * log2(2.0 * (n_a / ta) / ((n_a / ta) + (n_b / tb)))
              ELSE 0 END
       + CASE WHEN n_b > 0
              THEN (n_b / tb) * log2(2.0 * (n_b / tb) / ((n_a / ta) + (n_b / tb)))
              ELSE 0 END) + 0.5) AS BIGINT) / 100.0 AS js_x1000
FROM counts, tot
ORDER BY abs(n_a * tb - n_b * ta) DESC, token
LIMIT 20
""",
)
def corpus_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot drift monitor: token unigram distributions of
    two corpus snapshots (sources src0–src9 vs src10+, standing in for
    last month's crawl vs this month's) compared token-by-token — the
    top-20 drifted tokens with counts and their Jensen–Shannon
    divergence contribution. The RANKING key is exact
    cross-multiplied drift |n_a·total_b − n_b·total_a| computed in
    decimal(38,0) (Spark) / HUGEINT (DuckDB) — float rank keys could
    tie-flip between libms, and int64 would overflow once
    n·total > 2^63 (a 100 TB corpus reaches that; ANSI-off Spark would
    wrap SILENTLY). The rank key is deliberately NOT emitted: the
    exact wide-decimal arithmetic stays engine-internal, and the JS
    term rides along as a floor(x·10⁵+0.5)/100 diagnostic (the repo's
    exact-boundary-safe rounding idiom). Plan shape: one
    token shuffle builds both sides' counts in a single groupBy (no
    self-join of the corpus), totals ride a broadcast 1-row cross
    join, top-k is TakeOrdered — at 100 TB the only wide movement is
    the distinct-token count table. The drift signal is what a
    training-mixture owner watches between ingestion runs: a token
    whose mass shifts between snapshots flags topic/source drift
    before it moves the mixture."""
    d = load_table(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    tok = d.select(
        (src_num < 10).alias("is_a"),
        F.explode(X.tokens("text")).alias("token"),
    )
    counts = tok.groupBy("token").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("is_a"), 0).otherwise(1)).alias("n_b"),
    )
    totals = counts.agg(
        F.sum("n_a").cast("long").alias("ta"),
        F.sum("n_b").cast("long").alias("tb"),
    )
    j = counts.crossJoin(F.broadcast(totals))
    p_a = F.col("n_a") / F.col("ta")
    p_b = F.col("n_b") / F.col("tb")
    js = 0.5 * (
        F.when(
            F.col("n_a") > 0, p_a * F.log2(2.0 * p_a / (p_a + p_b))
        ).otherwise(F.lit(0.0))
        + F.when(
            F.col("n_b") > 0, p_b * F.log2(2.0 * p_b / (p_a + p_b))
        ).otherwise(F.lit(0.0))
    )
    dec = "decimal(38,0)"
    drift = F.abs(
        F.col("n_a").cast(dec) * F.col("tb").cast(dec)
        - F.col("n_b").cast(dec) * F.col("ta").cast(dec)
    )
    return (
        j.select(
            "token",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (
                F.floor(100000 * js + F.lit(0.5)).cast("long") / F.lit(100.0)
            ).alias("js_x1000"),
            drift.alias("__drift"),
        )
        .orderBy(F.desc("__drift"), F.asc("token"))
        .limit(20)
        .drop("__drift")
    )
