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
# Round-2 window: the two repaired TPC-H oracles (q9/q11 — HUGEINT
# typing fix) plus the 51-query surface that registered after position
# 50 in round 1 (LLM dedup/similarity/text/multimodal, pointers/union,
# streaming, events, reshape, extended). Deferred to the round-3
# window: the sf-bounded O(n²) oracle-twin queries
# (dedup_jaccard_pairs, dedup_simhash_pairs, dedup_embedding_cosine)
# and two rows-only checks (doc_fingerprint_native,
# multimodal_decode_features) — all locally oracle/pytest-green.
_PRIORITY: tuple[str, ...] = (
    "q9_product_profit",
    "q11_important_part_value",
    "dedup_exact_canonical",
    "dedup_minhash_lsh",
    "dedup_simhash_signatures",
    "dedup_simhash_banded",
    "dedup_clusters_minid",
    "dedup_keep_canonical_counts",
    "dedup_embedding_banded",
    "cosine_topk_bruteforce",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ivf_centroid_assignment",
    "embedding_label_stats",
    "doc_token_stats",
    "doc_quality_scores",
    "lang_id_ngram_heuristic",
    "doc_fingerprint_rolling",
    "doc_top_bigrams",
    "doc_lang_source_profile",
    "udtf_token_positions",
    "multimodal_metadata_stats",
    "multimodal_frame_sample",
    "multimodal_resize_metadata",
    "pointer_deref_supplier_nation",
    "pointer_self_prev_event",
    "union_event_payload",
    "stream_tumbling_daily_counts",
    "stream_distinct_user_event_keys",
    "stream_stateful_user_counts",
    "stream_user_sessions",
    "stream_static_enrich_counts",
    "stream_dedup_within_watermark",
    "sessionize_events",
    "tumbling_window_rollup",
    "funnel_view_to_purchase",
    "event_type_transitions",
    "split_merge_restructure",
    "reduce_custom_tally_geomean",
    "slice_offset_limit",
    "map_funcs_suite",
    "grouping_sets_flag_status",
    "percentiles_order_price",
    "pivot_qty_by_returnflag",
    "unpivot_order_measures",
    "histogram_order_price",
    "sample_hash_bernoulli",
    "train_test_split_counts",
    "stratified_topk_per_lang",
    "doc_chunk_windows",
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
