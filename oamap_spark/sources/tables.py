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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table from an sf directory as a DataFrame (lazy scan).

    ``events`` is normalized: its parquet ``ts`` is TIMESTAMP(NANOS),
    which Spark reads (only) as bigint via
    ``spark.sql.legacy.parquet.nanosAsLong``; we expose both the exact
    ``ts_ns`` (bigint nanoseconds since epoch — DuckDB twin:
    ``epoch_ns(ts)``) and a µs-truncated proper ``ts`` timestamp
    (DuckDB twin: ``make_timestamp(epoch_ns(ts)//1000)``).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F

        # integer `div`, NOT `/`: epoch-ns (~1.7e18) exceeds double's
        # 2^53 exact range, so float division would corrupt low digits
        df = df.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables; defaults to all of them."""
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}
