"""Driver contract for the spark-graft builder (PySpark target).

Backed by the central registry in ``oamap_spark.queries.registry`` —
every operator from SURVEY.md §2 is declared there with a Spark
callable and (when SQL-expressible) a DuckDB oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from oamap_spark.queries import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    fns = _registry.queries()
    return fns["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted → rows-only check)."""
    return _registry.oracle_sql()
