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


# ---------------------------------------------------------------------------
# Exact mergeable distinct counts: bitmap aggregates
# ---------------------------------------------------------------------------
# For integer keys, Spark's bitmap aggregates give what HLL cannot —
# EXACT distinct counts from mergeable state. Keys are bucketed into
# 32k-bit bitmaps (bucket = key >> 15); per group each bucket's bitmap
# ORs map-side, rollups OR the stored bitmaps again. State is
# O(key-range/8 bytes) instead of O(cardinality · key-width), merging
# is bitwise-OR (associative/commutative), and the count is exact at
# every level — the right tool when keys are dense ints (user ids,
# order keys) and HLL's ±1% is not acceptable.


def bitmap_group_sketches(
    df: DataFrame, keys: list[str], value_col: str, out: str = "bm"
) -> DataFrame:
    """Per-(keys, bucket) bitmap of ``value_col``'s distinct values.
    The bucket column is part of the stored table's key: a rollup ORs
    bitmaps within each bucket then sums bucket counts."""
    return (
        df.withColumn("bucket", F.bitmap_bucket_number(F.col(value_col)))
        .groupBy(*keys, "bucket")
        .agg(
            F.bitmap_construct_agg(F.bitmap_bit_position(F.col(value_col))).alias(out)
        )
    )


def bitmap_rollup_count(
    sketches: DataFrame, keys: list[str], bm: str = "bm", out: str = "n_distinct"
) -> DataFrame:
    """Exact distinct count at a coarser grouping: OR the bitmaps per
    (keys, bucket), count bits, sum over buckets."""
    per_bucket = sketches.groupBy(*keys, "bucket").agg(
        F.bitmap_count(F.bitmap_or_agg(bm)).alias("_n")
    )
    agg = F.sum("_n").alias(out)
    return per_bucket.groupBy(*keys).agg(agg) if keys else per_bucket.agg(agg)
