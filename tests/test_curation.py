"""Curation operators (queries/llm_curation.py): chunking invariants,
PII masking behavior on synthetic data, mixture determinism, and
contamination self-consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from oamap_spark.queries import llm_curation as C
from tests.conftest import SF_SMOKE


def test_chunks_cover_document_exactly(spark):
    """Concatenating chunks at stride with overlap removed must
    reconstruct the token stream: chunk 0 whole, later chunks
    contribute their last STRIDE tokens."""
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    chunks = C.doc_chunk_windows(spark, SF_SMOKE).join(
        d.select("doc_id", "text"), "doc_id"
    )
    rows = chunks.orderBy("doc_id", "chunk_idx").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in list(by_doc.items())[:50]:
        toks = rs[0]["text"].split(" ")
        rebuilt = rs[0]["chunk_text"].split(" ")
        for r in rs[1:]:
            piece = r["chunk_text"].split(" ")
            overlap = C.CHUNK - C.STRIDE
            start = r["chunk_idx"] * C.STRIDE
            # chunk must match the source slice exactly
            assert piece == toks[start : start + C.CHUNK]
            rebuilt.extend(piece[overlap if len(rebuilt) > start else 0 :])
        assert rebuilt[: len(toks)] == toks


def test_chunk_sizes_and_counts(spark):
    ch = C.doc_chunk_windows(spark, SF_SMOKE)
    bad = ch.where(
        (F.col("n_tokens") > C.CHUNK)
        | (F.col("n_tokens") <= 0)
        | (F.col("chunk_idx") < 0)
    ).count()
    assert bad == 0
    # every doc chunked
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert ch.select("doc_id").distinct().count() == n_docs


def test_scrub_pii_masks_synthetic(spark):
    df = spark.createDataFrame(
        [
            (1, "contact john.doe+x@example.com for info"),
            (2, "see https://example.com/a?b=1 now"),
            (3, "card 1234567890 is long"),
            (4, "clean text only"),
        ],
        ["id", "text"],
    )
    out = {
        r["id"]: r["s"]
        for r in df.select("id", C.scrub_pii(F.col("text")).alias("s")).collect()
    }
    assert out[1] == "contact <EMAIL> for info"
    assert out[2] == "see <URL> now"
    assert out[3] == "card <NUM> is long"
    assert out[4] == "clean text only"


def test_mixture_monotone_weights(spark):
    """Lower-weighted sources keep (stochastically) fewer docs; source
    src0 at weight 1.0 keeps everything."""
    res = {
        r["source"]: r["n_kept"]
        for r in C.corpus_mixture_weighted(spark, SF_SMOKE).collect()
    }
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    totals = {r["source"]: r["n"] for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert res["src0"] == totals["src0"]
    # determinism: second run identical
    res2 = {
        r["source"]: r["n_kept"]
        for r in C.corpus_mixture_weighted(spark, SF_SMOKE).collect()
    }
    assert res == res2


def test_contamination_flags_planted_dup(spark):
    """A benchmark doc's exact text planted into the train slice must
    surface with ≥1 shared gram."""
    from oamap_spark.operators.sampling import hash_threshold

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    bench_ids = [
        r["doc_id"]
        for r in d.where(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
            < hash_threshold(C.BENCH_FRACTION)
        ).collect()
    ]
    assert bench_ids, "no benchmark docs at this fraction"
    overlap = {
        r["bench_doc"]: (r["n_train_docs"], r["n_shared_grams"])
        for r in C.train_benchmark_overlap(spark, SF_SMOKE).collect()
    }
    assert set(overlap) == set(bench_ids)  # every bench doc reported


def test_percentile_approx_within_tolerance(spark):
    """The tolerance-gated query must report every group's approx
    percentile inside the ±2% band, and its exact quantiles must match
    an independent exact computation."""
    import __spark_entry__ as em

    rows = em.queries()["percentile_approx_price"](spark, SF_SMOKE).collect()
    assert rows, "no groups"
    for r in rows:
        assert r["p50_within_2pct"] and r["p95_within_2pct"], r
    exact = {
        r["o_orderstatus"]: r["p"]
        for r in spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(F.expr("round(percentile(o_totalprice, 0.5), 2)").alias("p"))
        .collect()
    }
    for r in rows:
        assert abs(r["exact_p50"] - exact[r["o_orderstatus"]]) < 1e-9
