"""Keyless interval join via binning (beyond the reference — oamap
has no joins at all; SURVEY §2.D lists range joins as a capability
gap).

A point-in-interval join WITHOUT an equi key is the pathological case
in Spark: the only native plan is BroadcastNestedLoopJoin — a cross
product with a post-filter, O(|intervals|·|points|) compares, and a
broadcast requirement on one whole side. The standard fix is to
manufacture the equi key: quantize time into fixed-width bins, explode
each interval into the bins it overlaps, map each point to its single
bin, then hash-join on the bin id and re-check the exact predicate.

Cost model: compares drop from |I|·|P| to Σ per-bin |I_b|·|P_b| —
data-local, shuffle on a uniformly distributed bin key, no broadcast
of a big side. Each interval duplicates into ceil(len/width)+1 bins,
so pick bin_width ≈ the typical interval length (explosion factor ≤2
while bins stay selective). Every step is narrow except the one
equi-join shuffle, so the plan scales like any other hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_interval_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    bin_width_us: int,
) -> DataFrame:
    """Inner-join `points` rows into `intervals` rows where
    start <= ts < end (end-exclusive), with no equi key required.

    Returns the joined frame (all columns from both inputs). Each
    point lands in exactly one bin, so a matched (interval, point)
    pair appears exactly once — no post-join dedup needed.

    Inner only: an outer flavor over the exploded intervals would
    emit one unmatched row per (interval, bin), not per interval —
    for outer semantics aggregate the inner result and join it back
    to the un-exploded interval table."""
    if bin_width_us <= 0:
        raise ValueError(f"bin_width_us must be positive, got {bin_width_us}")
    start_us = F.unix_micros(F.col(start_col))
    end_us = F.unix_micros(F.col(end_col))
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(start_us / bin_width_us),
                # end-exclusive: the last occupied bin holds end-1
                F.floor((end_us - 1) / bin_width_us),
            )
        ),
    )
    p = points.withColumn("__bin", F.floor(F.unix_micros(F.col(ts_col)) / bin_width_us))
    joined = i.join(
        p,
        (i["__bin"] == p["__bin"])
        & (p[ts_col] >= i[start_col])
        & (p[ts_col] < i[end_col]),
        "inner",
    )
    return joined.drop("__bin")
