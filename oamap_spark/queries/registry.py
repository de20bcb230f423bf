"""Central registry of declared queries.

Every operator from SURVEY.md §2 lands here as a named query: a Spark
callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a
DuckDB oracle SQL string. The driver runs both sides at sf0.01 and
compares row-count + schema + order-insensitive value hash, with
columns sorted by name — so **every computed column must carry the same
alias in both**.

Discipline for the float-hash oracle (SURVEY.md §7.8): aggregate sums
over doubles are rounded (``round(x, 2)``) on BOTH sides so the
engines' (identical to ~1e-9 relative) floating-point sums hash equal.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    extra: dict = field(default_factory=dict)


_REGISTRY: dict[str, QuerySpec] = {}

# Driver-window rotation (SURVEY.md §7.1). The correctness driver
# scores the FIRST 50 entries of ``queries()`` in iteration order, so
# this list pins the window each round: queries named here come first
# (in this order), everything else follows in registration order.
#
# Round-3 window: the 48 queries that have never appeared in a driver
# CORRECTNESS window (the complement of CORRECTNESS_r01 ∪ r02 — the
# entire late-round-2 surface: compiled queries, graph/time-series/
# stats, SCD, stream-stream joins, curation pipeline, O(n²) oracle
# twins, rows-only checks) plus two round-3 oracle-gated additions
# (dedup_minhash_lsh_capped, dedup_ngram_window_overlap) to fill the
# 50-slot window. After this round every query declared before round 3
# has a driver verdict across r1–r3; the other round-3 additions
# (sketches, profiling stats) rotate into the round-4 window.
_PRIORITY: tuple[str, ...] = (
    "asof_join_tolerance_30d",
    "salted_join_priority_volume",
    "retention_cohorts",
    "sliding_window_counts",
    "latest_event_per_user",
    "events_week_hour_profile",
    "doc_fingerprint_native",
    "doc_repetition_signals",
    "dominant_source_per_lang",
    "dedup_jaccard_pairs",
    "dedup_simhash_pairs",
    "fuzzy_join_part_names",
    "dedup_savings_by_source",
    "dedup_embedding_cosine",
    "embedding_label_centroids",
    "multimodal_decode_features",
    "stream_stream_view_purchase_join",
    "stream_stream_left_outer_join",
    "stream_sliding_window_counts",
    "stream_latest_event_per_user",
    "compiled_rowfn_revenue",
    "compiled_nested_event_loop",
    "corpus_token_budget_sample",
    "weighted_sample_docs",
    "doc_scrub_pii",
    "corpus_mixture_weighted",
    "train_benchmark_overlap",
    "doc_bpe_token_estimate",
    "doc_unigram_logprob_quality",
    "pack_sequences_greedy",
    "curation_pipeline_end_to_end",
    "stats_moments_suite",
    "date_spine_gap_fill",
    "window_rank_variants",
    "percentile_approx_price",
    "explode_outer_null_semantics",
    "window_range_7d_sum",
    "median_by_status",
    "map_hof_suite",
    "pagerank_event_types",
    "interpolate_daily_values",
    "table_stats_profile",
    "zscore_normalize_by_group",
    "triangle_counts_event_graph",
    "orders_monthly_growth",
    "merge_upsert_scd1",
    "scd2_intervals_from_events",
    "doc_tfidf_top_terms",
    "dedup_minhash_lsh_capped",
    "dedup_ngram_window_overlap",
)


def _ordered_names() -> list[str]:
    pri = [n for n in _PRIORITY if n in _REGISTRY]
    seen = set(pri)
    return pri + [n for n in _REGISTRY if n not in seen]


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator: declare a query. ``oracle=None`` → driver records the
    weaker rows-only check (reserved for genuinely non-SQL ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=_wrap(fn), oracle=oracle, tags=tags, doc=fn.__doc__ or "", bench=bench
        )
        return fn

    return deco


def _wrap(fn: QueryFn) -> QueryFn:
    """Apply session config (UTC, ANSI-off, nested pruning) before the
    query body runs — the driver owns the session, so config must be
    applied at call time."""
    from oamap_spark.session import configure_session

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        configure_session(spark)
        return fn(spark, sf_dir)

    wrapped.__doc__ = fn.__doc__
    wrapped.__name__ = getattr(fn, "__name__", name_of(fn))
    return wrapped


def name_of(fn) -> str:
    return getattr(fn, "__name__", "query")


def all_specs() -> dict[str, QuerySpec]:
    return {n: _REGISTRY[n] for n in _ordered_names()}


def queries() -> dict[str, QueryFn]:
    return {n: _REGISTRY[n].fn for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        n: _REGISTRY[n].oracle
        for n in _ordered_names()
        if _REGISTRY[n].oracle is not None
    }


def bench_queries() -> dict[str, QueryFn]:
    return {n: _REGISTRY[n].fn for n in _ordered_names() if _REGISTRY[n].bench}
