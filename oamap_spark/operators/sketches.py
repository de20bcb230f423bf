"""Mergeable distinct-count sketches (HyperLogLog) — the 100 TB
pre-aggregation pattern oamap never needed (it had no distinct-count
surface at all; absent from oamap/operations.py [H]).

The scale story: an exact COUNT(DISTINCT x) over 100 TB shuffles every
distinct value to its group's reducer — the shuffle width is the
*cardinality*. A Datasketches HLL sketch is a fixed-size (≤ 2^lgk
registers) mergeable summary: each partition builds its local sketch
(map-side, one pass), groups merge register-wise, and *stored* sketch
tables can be re-rolled to any coarser grouping later without touching
the raw data — daily sketches answer weekly/monthly/all-time distinct
users with a union over 7/30/365 rows per key. That re-aggregation is
exactly what Spark's ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate`` built-ins provide, JVM-side, inside
whole-stage codegen — no UDFs anywhere on this path.

Determinism note for the DuckDB oracle: Datasketches HLL is *exact*
while the sketch stays in sparse mode (roughly until the number of
distinct values approaches 0.75·2^lgk); with ``lgk=14`` every
cardinality in the sf0.01/sf0.1 testdata (≤ 1.5k distinct keys per
group) is far inside the sparse regime, so the estimates hash-equal
the exact counts and the queries are fully oracle-gated. At real
scale the same plan returns ±1.6%/sqrt(2^(lgk-12)) estimates — that
accuracy-for-bounded-memory trade is the point. A tolerance test
(``tests/test_sketches.py``) pins the dense-mode error at 50k distinct
values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 14


def sketch(value_col: Column | str, lgk: int = DEFAULT_LGK) -> Column:
    """Aggregate expression: HLL sketch of the distinct values of
    ``value_col`` (binary, ≤ ~0.75·2^lgk bytes dense)."""
    return F.hll_sketch_agg(value_col, lgk)


def group_sketches(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
    out: str = "sk",
) -> DataFrame:
    """Per-group sketch table: one binary sketch of ``value_col``'s
    distinct values per key combination. This is the *stored* artifact
    at scale — write it partitioned by the finest key and every
    coarser rollup becomes a metadata-sized union, not a raw rescan.
    The aggregation is map-side partial like any Tungsten agg: each
    task sketches locally, then fixed-size registers shuffle (never
    the values themselves)."""
    return df.groupBy(*keys).agg(sketch(value_col, lgk).alias(out))


def rollup_estimate(
    sketches: DataFrame,
    keys: list[str],
    sk: str = "sk",
    out: str = "approx_distinct",
) -> DataFrame:
    """Re-aggregate a sketch table to a coarser grouping: union the
    sketches register-wise and estimate. ``keys`` may be any subset of
    the sketch table's key columns (empty = global)."""
    est = F.hll_sketch_estimate(F.hll_union_agg(sk)).alias(out)
    return sketches.groupBy(*keys).agg(est) if keys else sketches.agg(est)
