"""Deterministic sampling & splitting for training-data pipelines
(beyond the reference — oamap has no sampling surface; SURVEY §2.D).

Everything here is **hash-deterministic**, not RNG-based: membership
depends only on a row's key, via the first hex digits of ``md5(key)``.
That is the property a 100 TB pipeline actually needs —

- reproducible across runs, partitionings, cluster sizes, and engines
  (``rand()``/``sampleBy`` depend on partition layout and seed-stream
  order; md5 of the key does not);
- stable under incremental reprocessing: a document keeps its
  train/test assignment when the corpus grows;
- embarrassingly parallel: a narrow per-row predicate, no shuffle, and
  it pushes below joins like any other filter.

Fractions are expressed in 1/65536 granularity (4 hex digits compared
lexicographically — both Spark and DuckDB emit lowercase hex md5, so
the string compare equals the numeric compare and the same rows are
selected by either engine, which is what makes these oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hex4(key: Column) -> Column:
    """First 4 hex digits of md5(key) — a uniform value in [0, 0x10000)
    encoded as a lexicographically ordered lowercase-hex string."""
    return F.substring(F.md5(key.cast("string")), 1, 4)


def hash_threshold(fraction: float) -> str:
    """Hex threshold string such that P[_hex4(key) < threshold] ==
    round(fraction * 65536) / 65536 under a uniform hash."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    v = round(fraction * 0x10000)
    # 0x10000 would render as the 5-char "10000", which sorts *below*
    # "ffff" lexicographically; "g" is above every hex string.
    return "g" if v >= 0x10000 else format(v, "04x")


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose md5(key)
    prefix falls under the fraction threshold. Narrow (no shuffle);
    re-runs and engine swaps select byte-identical membership."""
    return df.where(_hex4(F.col(key_col)) < hash_threshold(fraction))


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float, label_col: str = "split"
) -> DataFrame:
    """Tag each row 'test' / 'train' by hash threshold. A row's
    assignment is a pure function of its key: growing the corpus never
    reassigns existing rows (the property that keeps eval sets
    uncontaminated across dataset versions)."""
    return df.withColumn(
        label_col,
        F.when(
            _hex4(F.col(key_col)) < hash_threshold(test_fraction), F.lit("test")
        ).otherwise(F.lit("train")),
    )


def stratified_quota_sample(
    df: DataFrame, strata_col: str, key_col: str, k: int
) -> DataFrame:
    """Exactly-k-per-stratum sample, ranked by md5(key) — i.e. a
    deterministic uniform draw without replacement within each
    stratum. One shuffle on the strata key; the window never sees more
    than a stratum per partition. (Ties are impossible: md5 of
    distinct keys collides with probability ~2⁻¹²⁸; key appended to
    the ordering anyway for total order.)"""
    w = (
        Window.partitionBy(strata_col)
        .orderBy(F.md5(F.col(key_col).cast("string")), F.col(key_col))
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def epoch_shuffle(
    df: DataFrame, key_col: str, epoch: int, bucket_hex: int = 3
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    dense position (0-based) in an order derived from
    md5(epoch ‖ ':' ‖ key) — a different but REPRODUCIBLE permutation
    per epoch, identical on any engine, partitioning, or retry (unlike
    orderBy(rand()), whose layout-dependent draws are retry-unsafe —
    the repartition(rand()) pitfall, operators/partitioning.py).

    The dense positions are computed DISTRIBUTED — never a global
    single-task window (`Window.orderBy` with no partition key is the
    classic 100 TB bottleneck). Standard two-pass dense-rank:

    1. bucket = first ``bucket_hex`` hex chars of the hash (default 3
       → 4096 buckets; r7 VERDICT "What's wrong #3" — 2 chars capped
       the rank stage at 256 tasks, ~400 GB of spillable sort each at
       100 TB); per-bucket row_number windows run in parallel, and
       because the bucket is a PREFIX of the sort key, bucket-major
       order ≡ global (h, key) order. md5 is uniform, so bucket sizes
       are balanced by construction — pick ``bucket_hex`` so
       rows/16^bucket_hex fits one task's sort comfortably;
    2. a 16^bucket_hex-row bucket-count table → running-sum offsets
       (tiny model state, like k-means centroids — 4096 rows still
       broadcasts for free) broadcast back; position = bucket offset
       + within-bucket rank.

    A training pipeline materializing an epoch would instead
    repartitionByRange(h).sortWithinPartitions(h) and write shards
    (positions implicit in shard order); the explicit dense position
    here is the oracle-checkable verification surface of the same
    order. md5 ties are broken by the key itself, so the order is
    total — PROVIDED ``key_col`` is a unique non-null key (r7 review:
    duplicate keys share a hash AND a tie-break, making their relative
    positions layout-dependent; null keys all collapse to one hash
    because concat_ws skips nulls). Both preconditions are enforced
    in-plan at ~zero cost: a per-row assert on null keys, and a
    duplicate probe on the sort order itself (duplicates of a key are
    ADJACENT in the per-bucket (h, key) sort, so lag(key) == key
    catches every one — no extra shuffle, it rides the rank window).
    CAVEAT (ADVICE r7): the guards live inside the ``epoch_pos``
    expression by design (a dropped assert column would be pruned);
    they therefore fire only when ``epoch_pos`` is actually consumed —
    a caller that drops ``epoch_pos`` has opted out of both the
    positions and their preconditions. A further precondition the
    guards cannot see: ``df`` must be DETERMINISTIC across re-reads
    (no upstream ``sample()``/``rand()``) — the bucket-count pass
    re-reads the input, and a nondeterministic source can make counts
    and per-bucket ranks diverge, producing non-dense or colliding
    positions with no error. Persist the keyed projection first if
    determinism can't be assumed.

    Cost note: the bucket-count pass re-reads the input, but Catalyst
    column-prunes it to ``key_col`` alone (narrow parquet scan + md5);
    persisting the full corpus to save a key-column scan would be the
    wrong trade at 100 TB — this is the same sample-then-sort shape as
    Spark's own range partitioner."""
    if not 1 <= int(bucket_hex) <= 8:
        raise ValueError(f"epoch_shuffle: bucket_hex must be in [1, 8], got {bucket_hex}")
    reserved = {"__h", "__b", "__r", "__off", "__dup", "epoch_pos"} & set(df.columns)
    if reserved:
        # withColumn would silently overwrite (then drop) them (ADVICE r7)
        raise ValueError(
            f"epoch_shuffle: input already has reserved column(s) {sorted(reserved)}"
        )
    h = F.md5(
        F.concat_ws(":", F.lit(int(epoch)).cast("string"), F.col(key_col).cast("string"))
    )
    wb = Window.partitionBy("__b").orderBy("__h", F.col(key_col))
    keyed = df.withColumn("__h", h).withColumn(
        "__b", F.substring("__h", 1, int(bucket_hex))
    )
    counts = keyed.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    wo = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__n").over(wo), F.lit(0)).cast("long").alias("__off")
    )
    # guards live INSIDE the epoch_pos expression (a dropped assert
    # column would be pruned by Catalyst); __dup rides the same window
    # pass as the rank, so both checks are free
    ranked = keyed.select(
        "*",
        F.row_number().over(wb).cast("long").alias("__r"),
        (F.lag(key_col).over(wb) == F.col(key_col)).alias("__dup"),
    )
    pos = F.col("__off") + F.col("__r") - F.lit(1).cast("long")
    guarded = (
        F.when(
            F.col(key_col).isNull(),
            F.raise_error(F.lit(f"epoch_shuffle: null {key_col}")).cast("long"),
        )
        .when(
            F.coalesce(F.col("__dup"), F.lit(False)),
            F.raise_error(F.lit(f"epoch_shuffle: duplicate {key_col}")).cast("long"),
        )
        .otherwise(pos)
    )
    return (
        ranked.join(F.broadcast(offsets), "__b")
        .withColumn("epoch_pos", guarded)
        .drop("__b", "__h", "__r", "__off", "__dup")
    )


def temperature_mixture_sample(
    df: DataFrame, key_col: str, group_col: str, target_frac: float
) -> DataFrame:
    """Deterministic temperature-flattened mixture sampling — the
    data-mixing step of a training pipeline: sources are drawn with
    probability ∝ sqrt(count) (temperature α = 0.5) instead of raw
    count, so giant sources are down-weighted and small sources
    over-represented relative to natural frequency, with a global
    budget of ``target_frac`` of the corpus.

    Per group g: rate_g = min(1, N·p_g / n_g) with p_g =
    sqrt(n_g) / Σ sqrt(n_h) and N = target_frac · Σ n_h; a row is kept
    iff its 32-bit md5(key) integer < floor(rate_g · 2³²) — membership
    is a pure function of (corpus counts, key), so the same corpus
    always yields the same sample on any engine or partitioning.

    Engine-exactness discipline (what makes this oracle-checkable):
    α is FIXED at 0.5 because IEEE sqrt is correctly rounded on every
    engine while pow(x, α) is not; Σ sqrt(n) is accumulated in sorted
    group order via a running window (not a hash-agg whose float
    addition order is nondeterministic); the keep test compares
    integers. Plan shape: two tiny aggregates over the group domain, a
    broadcast of the per-group threshold table, one narrow filter —
    no extra shuffle of the corpus itself at any scale.

    Rows with a NULL group form their own stratum (null-safe join), so
    no row silently vanishes from the mixture; rows with a NULL key
    hash to NULL and are never sampled -- keys follow the same
    unique-non-null contract as every hash-sampling op here."""
    reserved = {"__g", "__thr"} & set(df.columns)
    if reserved:
        raise ValueError(
            "temperature_mixture_sample: reserved column name(s) in use "
            f"{sorted(reserved)}"
        )
    n = F.count(F.lit(1)).alias("n")
    counts = df.groupBy(F.col(group_col).alias("__g")).agg(n)
    # NULLS LAST pins the float accumulation order of __cumw/__sumw to
    # DuckDB's default ASC order — Spark sorts NULLs first, and a NULL
    # stratum accumulated in a different position could flip a
    # threshold at a ulp boundary, breaking bit-exactness.
    wg = Window.orderBy(F.col("__g").asc_nulls_last()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.withColumn("__cumw", F.sum(F.sqrt("n")).over(wg))
    tot = cum.agg(
        F.sum("n").cast("double").alias("__total"), F.max("__cumw").alias("__sumw")
    )
    rate = F.least(
        F.lit(1.0),
        (F.lit(float(target_frac)) * F.col("__total"))
        * (F.sqrt("n") / F.col("__sumw"))
        / F.col("n"),
    )
    thr = cum.crossJoin(F.broadcast(tot)).select(
        "__g",
        F.floor(rate * F.lit(4294967296.0)).cast("long").alias("__thr"),
    )
    h32 = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return (
        df.join(F.broadcast(thr), df[group_col].eqNullSafe(F.col("__g")))
        .where(h32 < F.col("__thr"))
        .drop("__g", "__thr")
    )
