"""HLL sketch operator semantics: sparse-regime exactness (what the
oracle gate relies on), merge associativity (what makes stored sketch
tables re-rollable), and the dense-regime error bound (what the 100 TB
user actually gets)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oamap_spark.operators import sketches as SK
from tests.conftest import SF_SMOKE


def test_sketch_table_schema_and_exactness(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    daily = SK.group_sketches(
        ev.withColumn("day", F.date_trunc("day", "ts")), ["day"], "user_id"
    )
    assert dict(daily.dtypes)["sk"] == "binary"
    est = SK.rollup_estimate(daily, ["day"], out="est")
    exact = (
        ev.withColumn("day", F.date_trunc("day", "ts"))
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("exact"))
    )
    bad = est.join(exact, "day").filter(F.col("est") != F.col("exact")).count()
    assert bad == 0


def test_rollup_is_grouping_invariant(spark):
    """Union-merge is associative/commutative: rolling day-sketches or
    (day, event_type)-sketches to the same coarser key gives identical
    estimates — the property that makes a stored sketch table
    re-aggregatable along any dimension."""
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").withColumn(
        "week", F.date_trunc("week", "ts")
    )
    by_day = SK.group_sketches(
        ev.withColumn("day", F.date_trunc("day", "ts")), ["week", "day"], "user_id"
    )
    by_day_type = SK.group_sketches(
        ev.withColumn("day", F.date_trunc("day", "ts")),
        ["week", "day", "event_type"],
        "user_id",
    )
    a = {r["week"]: r["e"] for r in SK.rollup_estimate(by_day, ["week"], out="e").collect()}
    b = {
        r["week"]: r["e"]
        for r in SK.rollup_estimate(by_day_type, ["week"], out="e").collect()
    }
    assert a == b


def test_dense_regime_error_bound(spark):
    """Past the sparse regime the estimate is approximate; lgk=14
    gives a relative standard error of ~0.81%, so 50k distinct values
    must estimate within 2% (≈2.5 sigma) — the accuracy contract a
    100 TB rollup runs under."""
    n = 50_000
    df = spark.range(n).select((F.col("id") % 16).alias("g"), F.col("id").alias("v"))
    sk = SK.group_sketches(df, ["g"], "v")
    est = SK.rollup_estimate(sk, [], out="e").collect()[0]["e"]
    assert abs(est - n) / n < 0.02


def test_partitioning_invariance(spark):
    """Sketch results must not depend on physical partitioning (the
    map-side partial aggregation merges the same registers whatever
    the split)."""
    df = spark.range(10_000).select((F.col("id") % 997).alias("v"))
    e1 = SK.rollup_estimate(SK.group_sketches(df.repartition(1), [], "v"), [], out="e")
    e2 = SK.rollup_estimate(SK.group_sketches(df.repartition(16), [], "v"), [], out="e")
    assert e1.collect()[0]["e"] == e2.collect()[0]["e"] == 997


def test_bitmap_exact_distinct_and_rollup(spark):
    """Bitmap sketches are exact at every level, including values that
    straddle bucket boundaries (bucket = 32k-bit spans)."""
    from oamap_spark.operators.sketches import (
        bitmap_group_sketches,
        bitmap_rollup_count,
    )

    # ids straddle several 32768-wide buckets on purpose
    df = spark.range(100_000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") * 7 % 90_001).alias("v")
    )
    sk = bitmap_group_sketches(df, ["g"], "v")
    got = {r["g"]: r["n"] for r in bitmap_rollup_count(sk, ["g"], out="n").collect()}
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == exact
    # global rollup from the same stored sketches
    tot = bitmap_rollup_count(sk, [], out="n").collect()[0]["n"]
    assert tot == df.select("v").distinct().count()


def test_sketch_table_survives_parquet_roundtrip(spark, tmp_path):
    """The 'stored artifact' claim made real: a per-day HLL sketch
    table WRITTEN TO PARQUET and read back must re-roll to the same
    estimates as the live frame — binary sketch columns round-trip
    through storage, so daily sketches persisted once answer weekly /
    monthly / all-time questions forever without rescanning events."""
    from oamap_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    daily = SK.group_sketches(
        ev.withColumn("day", F.date_trunc("day", "ts")), ["day"], "user_id"
    )
    path = str(tmp_path / "daily_sketches")
    daily.write.parquet(path)
    stored = spark.read.parquet(path)
    live = {
        r["day"]: r["n"]
        for r in SK.rollup_estimate(daily, ["day"], out="n").collect()
    }
    replayed = {
        r["day"]: r["n"]
        for r in SK.rollup_estimate(stored, ["day"], out="n").collect()
    }
    assert replayed == live and live
    # global rollup from storage == exact distinct over raw events
    tot = SK.rollup_estimate(stored, [], out="n").collect()[0]["n"]
    assert tot == ev.select("user_id").distinct().count()
