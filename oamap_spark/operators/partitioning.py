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
