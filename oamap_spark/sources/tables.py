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
    """Load one table from an sf directory as a DataFrame (lazy scan)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables; defaults to all of them."""
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}
