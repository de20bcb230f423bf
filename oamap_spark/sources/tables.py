"""Parquet table sources.

oamap's backends (``oamap/backend/parquet.py`` — Dremel levels → masks
and list starts/stops) map 1:1 onto Spark's built-in vectorized parquet
reader: same Dremel model, already columnar, already pruned. So the
"source layer" here is deliberately thin — ``spark.read.parquet`` with
the scan-level knobs that matter at 100 TB (partition sizing is left to
``spark.sql.files.maxPartitionBytes``; filters/pruning flow from the
declarative plan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor — at
# 100 TB these stay O(MB) (region=5, nation=25 rows always).
BROADCAST_TABLES = frozenset({"region", "nation"})


def normalize_events(df: DataFrame) -> DataFrame:
    """Expose both ``ts_ns`` (bigint ns since epoch — DuckDB twin
    ``epoch_ns(ts)``) and a µs ``ts`` timestamp (DuckDB twin
    ``make_timestamp(epoch_ns(ts)//1000)``) for the events table,
    whatever layout its parquet ``ts`` arrives in:

    - TIMESTAMP(NANOS) parquet → Spark can only scan it as bigint via
      ``spark.sql.legacy.parquet.nanosAsLong`` → rename to ``ts_ns``;
    - timestamp[us] parquet → TIMESTAMP/_NTZ column → ``unix_micros``
      (session tz is pinned UTC, so the NTZ→LTZ cast is identity).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    df = df.withColumnRenamed("ts", "ts_ns")
    if not isinstance(df.schema["ts_ns"].dataType, T.LongType):
        df = df.withColumn(
            "ts_ns", F.unix_micros(F.col("ts_ns").cast("timestamp")) * F.lit(1000)
        )
    # integer `div`, NOT `/`: epoch-ns (~1.7e18) exceeds double's
    # 2^53 exact range, so float division would corrupt low digits
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table from an sf directory as a DataFrame (lazy scan).

    ``events`` is normalized via :func:`normalize_events` so queries see
    a stable (``ts_ns`` bigint, ``ts`` µs-timestamp) pair regardless of
    which parquet timestamp encoding the generator used.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables; defaults to all of them."""
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}
