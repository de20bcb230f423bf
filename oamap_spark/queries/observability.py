"""Observability declared queries — the Observation API surface
(plans/metrics.py) graduated from tests-only to oracle-gated
(VERDICT r3 "Next round #9").

oamap's operations were eager — every step returned concrete arrays
you could ``len()`` — so pipeline visibility was free. Spark plans are
lazy; the analog is ``df.observe``: named aggregate expressions
computed by the SAME tasks that run the query, no second scan. The
declared query here returns the observed metrics themselves as a
1-row DataFrame, so the driver's DuckDB oracle certifies the metric
VALUES cross-engine, not merely that the API runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oamap_spark.plans.metrics import observed
from oamap_spark.queries.registry import register
from oamap_spark.sources.tables import load_table


@register(
    "observed_ingest_quality",
    tags=("observability", "metrics", "observe"),
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchases,
       CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_props,
       round(sum(value), 2) AS total_value,
       CAST(sum(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM events
""",
)
def observed_ingest_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-quality metrics riding an actual pipeline action: events
    flow through a filter (value > 100) with four observe() metrics
    attached BEFORE the filter — row count, purchase count, null-props
    count, total value — plus the filter's survivor count. One scan
    computes everything (the observe aggregates merge per task inside
    the same stage as the filter); at 100 TB that is the difference
    between "metrics for free" and a second 100 TB pass. The returned
    1-row frame carries the observed values so the oracle hash
    certifies them. The tiny createDataFrame is metrics marshalling,
    not data movement — 5 scalars cross the driver, never rows."""
    ev = load_table(spark, sf_dir, "events")
    df, obs = observed(
        ev,
        "ingest_quality",
        n_rows=F.count(F.lit(1)),
        n_purchases=F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ),
        null_props=F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)),
        total_value=F.round(F.sum("value"), 2),
    )
    n_kept = df.where(F.col("value") > 100.0).count()  # the action
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["n_purchases"]),
                int(m["null_props"]),
                float(m["total_value"]),
                int(n_kept),
            )
        ],
        "n_rows long, n_purchases long, null_props long, "
        "total_value double, n_kept long",
    )
