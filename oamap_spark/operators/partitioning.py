"""Partitioning & skew operators — the shuffle-shaping levers for the
100 TB case (SURVEY §7.1/§7.4; absent in oamap, which never shuffles).

- co_partition: pre-shuffle N dataframes onto the same hash
  partitioning so every downstream equi-join/agg on that key reuses
  the partitioning instead of inserting its own exchange. The Spark
  image of bucketed tables when no metastore is at hand; with one,
  `writer.bucketBy(n, key).saveAsTable(...)` persists the same layout.
- salted_join: big×big equi-join with one hot key side salted and the
  other exploded across the salt domain. AQE's skew-join splitting
  (`spark.sql.adaptive.skewJoin`, on by default) handles moderate
  skew at runtime; explicit salting is for the pathological case
  where one key dominates a partition regardless of splitting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def co_partition(dfs: Sequence[DataFrame], key: str, n: int) -> list[DataFrame]:
    """Hash-partition every df on `key` into n partitions. Joins/aggs
    on `key` downstream see matching outputPartitioning and add no
    further exchange (assert via plans.audit.shuffle_count)."""
    return [df.repartition(n, F.col(key)) for df in dfs]


def salt_column(salt: int, seed: int = 7) -> Column:
    """THE salt assignment :func:`salted_join` applies to its skewed
    side — exposed (r6 review) so anything reasoning about the salted
    layout (bench.py's max-reducer-pairs straggler bound) derives it
    from the same expression the join executes, instead of re-deriving
    a private implementation detail that could silently drift."""
    return (F.rand(seed=seed) * salt).cast("int")


# join types where every output row is driven by the (salted-once)
# skewed side, so salting cannot duplicate anything. Normalized form:
# lowercase, underscores removed ("left_outer" → "leftouter").
_SALT_SAFE_HOW = frozenset(
    {"inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti"}
)


def salted_join(
    big: DataFrame,
    skewed: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `skewed`'s key distribution is pathological:
    `skewed` rows get a random salt in [0, salt); `big` is replicated
    across all salt values. The shuffle key becomes (key, salt), so a
    hot key spreads over `salt` reducers instead of one. Result equals
    the plain join (salt columns are internal) — for the SUPPORTED
    join types only: those that never emit an unmatched `big` row.
    With how='right'/'full' an unmatched `big` row would surface once
    per salt replica (salt-fold duplicates, nulls on the skewed side),
    so outer joins preserving the `big` side raise ValueError
    (ADVICE r6 #1). Joins preserving only the `skewed` side are fine:
    each skewed row is salted exactly once.

    Cost model: replicates `big` salt-fold — use when `big` is the
    *smaller* big table or when a handful of keys carry a large share
    of `skewed`. rand() is seeded per-salt-row, not per-task, so the
    join stays correct under task retry (each row's salt is computed
    once, travels with the row)."""
    if how.lower().replace("_", "") not in _SALT_SAFE_HOW:
        raise ValueError(
            f"salted_join: how={how!r} would emit unmatched `big` rows "
            f"once per salt replica; supported: inner/left/left_semi/"
            f"left_anti"
        )
    exploded_big, salted_small = salted_frames(big, skewed, salt)
    out = salted_small.join(exploded_big, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def salted_frames(
    big: DataFrame, skewed: DataFrame, salt: int
) -> tuple[DataFrame, DataFrame]:
    """The two pre-drop projections :func:`salted_join` executes —
    (exploded `big`, salted `skewed`), each carrying ``__salt``.
    Exposed (ADVICE r6 #2) so diagnostics reasoning about the salted
    layout (bench.py's max-reducer-pairs straggler bound) are built by
    the SAME code path as the executed join, instead of an independent
    re-derivation that could silently drift from the real layout."""
    salted_small = skewed.withColumn("__salt", salt_column(salt))
    exploded_big = big.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return exploded_big, salted_small


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int, path: str
) -> None:
    """Persist `df` hash-bucketed (and per-bucket sorted) on `key` —
    the durable form of co_partition. Downstream equi-joins and aggs
    between tables bucketed on the same key at the same bucket count
    read co-located data and skip the exchange entirely (assert with
    plans.audit.shuffle_count == 0): at 100 TB this converts every
    repeated fact⋈fact join on the bucket key from a full network
    shuffle into a local merge."""
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def bloom_semijoin_reduce(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int | None = None,
    n_hashes: int = 2,
) -> DataFrame:
    """Semi-join reduction: drop fact rows that cannot match `dim`
    BEFORE the join's shuffle, using a Bloom-style hash-position set
    of the dim keys — the lever for the dim-too-big-to-broadcast,
    fact-huge case. Spark's own runtime bloom filter
    (`spark.sql.optimizer.runtime.bloomFilter.*`) does this
    automatically but only above size thresholds the optimizer
    controls; this operator is the explicit, always-on form with the
    same shape: a 100 TB fact side sheds non-matching rows at the
    scan instead of shuffling rows the join would discard anyway.

    Mechanics (all JVM-side, whole-stage codegen):
      build:  each dim key maps to `n_hashes` positions
              pmod(xxhash64(key, seed), n_bits); the DISTINCT position
              set (≤ min(n_hashes·|dim|, n_bits) longs) is the filter.
      probe:  one broadcast LEFT SEMI hash join per hash function — a
              fact row survives only if ALL its probed positions are
              in the set. Each probe is an O(1) broadcast-hash-relation
              lookup under whole-stage codegen.

    Deliberately NOT a packed-bitmap ride: an earlier variant packed
    the positions into one array<long> row and cross-joined it, and
    the probe condition then dragged the whole array through every
    row's evaluation — measured 19.6 s vs 0.78 s for these semi-joins
    at n_bits=2^20 on sf0.1 lineitem (identical output rows). The
    position-set broadcast costs ~8 bytes per distinct position
    (vs n_bits/8 packed) — at the recommended sizing that is a few
    MB per 100k dim keys, trivially broadcastable, and the probe cost
    is independent of n_bits.

    False positives pass the filter and are removed by the exact join
    the caller runs next — results are bit-identical to the unfiltered
    join; only the shuffled row count changes. Returns `fact` filtered
    (original columns, no helper columns added). Deterministic:
    xxhash64 is a fixed hash, no RNG.

    SIZING: fp ≈ (1 - e^(-n_hashes·|dim| / n_bits)) ^ n_hashes — at
    n_bits = 16·|dim| and n_hashes=2 that is ~1.4%; letting the
    position space saturate (n_bits ≲ 2·|dim|) degrades toward a
    pass-through (measured in bench.py's bloom_prefilter_shuffled_rows
    arm: 2^16 positions at 30k keys hit fp ~36% and shed only half the
    non-matching rows; 2^20 sheds ~all). The default `n_bits=None`
    AUTO-SIZES to max(2^16, 16·dim.count()) — the count is one narrow
    pass over the (already filtered, single-column) dim at plan-build
    time, the price of a prefilter that cannot silently saturate when
    the dim outgrows a hardcoded constant. Pass an explicit n_bits to
    skip the count when the dim cardinality is known."""
    if n_bits is None:
        n_bits = max(1 << 16, 16 * dim.select(dim_key).distinct().count())
    if n_bits < 64:
        raise ValueError(f"n_bits must be >= 64, got {n_bits}")
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    # xxhash64 is type-sensitive while the equi-join the caller runs
    # next casts for comparison: an int fact key never hashes equal to
    # a bigint dim key, and every true match would be silently shed —
    # the one failure mode a prefilter must never have. Refuse.
    f_type = fact.schema[fact_key].dataType
    d_type = dim.schema[dim_key].dataType
    if f_type != d_type:
        raise ValueError(
            f"fact_key {fact_key}: {f_type} and dim_key {dim_key}: "
            f"{d_type} must have identical types — xxhash64 is "
            "type-sensitive, a mismatch sheds true matches; cast one "
            "side before calling"
        )

    def probes(key: str) -> list[Column]:
        return [
            F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(n_bits))
            for i in range(n_hashes)
        ]

    from oamap_spark.cache import track

    bits = dim.select(
        F.explode(F.array(*probes(dim_key))).alias("__pos")
    ).distinct()
    if n_hashes > 1:
        # each semi join builds its own broadcast from this subtree —
        # persist so the dim scan + distinct runs once, not n_hashes
        # times (caller-owned lifetime via cache.sweep)
        bits = track(bits)
    out = fact
    for p in probes(fact_key):
        # bits["__pos"] binds to the broadcast side, so a fact column
        # named __pos cannot collide — no reserved names on `fact`
        out = out.join(F.broadcast(bits), p == bits["__pos"], "left_semi")
    return out
