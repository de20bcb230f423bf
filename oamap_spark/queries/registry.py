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
# Round-4 window (VERDICT r3 "Next round #2"): the 13 round-3 queries
# that have never had a driver verdict, then the three queries whose
# output/oracle changed this round (the centroids red-row fix and the
# two de-vacuized embedding-dedup gates), then the 27 new/changed round-4
# queries (incl. approx_distinct_parts and doc_fingerprint_native,
# rows-only entries converted to oracle-gated forms), and the
# remaining 7 slots re-check the oldest round-1 verdicts (the
# twenty-one r1 names listed past slot 50 keep their r1 verdicts).
# After this round all declared queries have a driver verdict across
# r1–r4.
_PRIORITY: tuple[str, ...] = (
    # -- never driver-checked (declared round 3)
    "hll_region_distinct_customers",
    "hll_weekly_users_from_daily_sketches",
    "bitmap_distinct_custs_by_priority",
    "winsorized_value_stats",
    "event_type_entropy_daily",
    "gini_acctbal_by_nation",
    "pointer_tree_root_depth",
    "pointer_tree_grandparent",
    "recursive_cte_subtree_stats",
    "union_tagged_dispatch_events",
    "stream_daily_distinct_users_hll",
    "dedup_incremental_vs_corpus",
    "embedding_int8_quantization_error",
    # -- changed this round (red-row fix + de-vacuized gates)
    "embedding_label_centroids",
    "dedup_embedding_cosine",
    "dedup_embedding_banded",
    # -- new round-4 queries
    "pointer_chain_depth_root",
    "percentile_approx_price",
    "observed_ingest_quality",
    "lateral_top3_orders_per_customer",
    "nullsafe_join_event_props",
    "hll_intersection_view_purchase",
    "variant_props_typed_extract",
    "try_error_handling_suite",
    "heavy_hitter_terms",
    "regression_stats_suite",
    "stream_foreachbatch_upsert_latest",
    "crosstab_priority_status",
    "approx_distinct_parts",
    "doc_fingerprint_native",
    "csv_source_roundtrip_agg",
    "xml_source_roundtrip_agg",
    "orc_source_roundtrip_agg",
    "fromdata_union_inference_agg",
    "parquet_partitioned_write_prune_agg",
    "listagg_priorities_by_status",
    "array_mutation_suite",
    "string_mutation_suite",
    "rollup_grouping_id_levels",
    "date_calendar_suite",
    "zorder_write_filtered_agg",
    "batch_session_window_stats",
    "stream_chained_hourly_to_daily",
    # -- oldest verdicts (round-1 window, in its original order)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q4_priority_with_late_ship",
    "q7_volume_between_nations",
    "q8_market_share",
    "q9_product_profit",
    "q12_priority_by_ship_year",
    "q14_promo_revenue_share",
    "q15_top_suppliers",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_predicates",
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q11_important_part_value",
    "q13_order_count_distribution",
    "q16_supplier_part_counts",
    "q20_dominant_shippers",
    "q21_lone_late_suppliers",
    "semi_join_customers_with_orders",
    "anti_join_customers_without_orders",
    "range_join_ship_within_90d",
    "theta_join_nation_pairs",
    "asof_join_latest_order_before_event",
    "rollup_flag_status",
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
