"""cache.track/sweep: caller-owned persists must be reclaimable and
must not accumulate across repeated invocations (ADVICE r5 #3)."""

from __future__ import annotations

from oamap_spark import cache
from oamap_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_two_invocations_leave_cache_flat(spark):
    """Two full invocations of a persist()-ing operator, swept after
    each: the JVM's persistent-RDD registry must end exactly where it
    started — the accumulation VERDICT r6 #5 flagged."""
    from oamap_spark.operators.dedup import minhash_lsh_pairs

    cache.sweep()
    spark.catalog.clearCache()
    base = _n_cached(spark)
    d = load_table(spark, SF_SMOKE, "documents")
    for _ in range(2):
        minhash_lsh_pairs(d, "doc_id", "text").count()
        assert cache.tracked_count() >= 1  # the signature table
        assert cache.sweep() >= 1
    assert _n_cached(spark) == base
    assert cache.tracked_count() == 0


def test_recall_gate_persists_are_tracked(spark):
    """The ANN recall gate persists two tiny frames per invocation —
    both must be registered with the sweep hook."""
    from oamap_spark.queries.llm_similarity import (
        _exact_top5,
        _with_recall_gate,
        ann_production_topk_ids,
    )

    cache.sweep()
    spark.catalog.clearCache()
    base = _n_cached(spark)
    e = load_table(spark, SF_SMOKE, "embeddings")
    before = cache.tracked_count()
    _with_recall_gate(_exact_top5(e), ann_production_topk_ids(e)).count()
    assert cache.tracked_count() == before + 2  # exact + hits
    cache.sweep()
    assert _n_cached(spark) == base


def test_sweep_idempotent_and_clearcache_compatible(spark):
    """sweep() after clearCache() (bench.py calls both) must not
    raise; a second sweep with nothing tracked returns 0."""
    from oamap_spark.operators.heavyhitters import heavy_hitters

    d = load_table(spark, SF_SMOKE, "documents")
    heavy_hitters(d.selectExpr("explode(split(text, ' ')) AS w"), "w",
                  capacity=20, min_frac=0.06).count()
    spark.catalog.clearCache()  # out-of-band clear first
    assert cache.sweep() >= 1   # handles still tracked; unpersist is a no-op
    assert cache.sweep() == 0
