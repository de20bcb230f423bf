"""Observation metrics: computed by the query's own tasks, no second
scan, correct under partial aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from oamap_spark.plans.metrics import observed
from tests.conftest import SF_SMOKE


def test_observed_metrics_ride_the_query(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    obs_df, obs = observed(
        ev,
        "ingest",
        n_rows=F.count(F.lit(1)),
        n_null_props=F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)),
        max_value=F.round(F.max("value"), 2),
    )
    out = obs_df.where(F.col("event_type") == "purchase").groupBy().count()
    got = out.collect()[0]["count"]
    m = obs.get
    # metrics observe the PRE-filter point of the plan
    assert m["n_rows"] == ev.count()
    assert m["n_null_props"] == ev.where(F.col("props").isNull()).count()
    assert got == ev.where(F.col("event_type") == "purchase").count()


def test_observed_after_filter_counts_survivors(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    filtered = ev.where(F.col("value") > 50)
    obs_df, obs = observed(filtered, "survivors", n=F.count(F.lit(1)))
    obs_df.groupBy("event_type").count().collect()
    assert obs.get["n"] == filtered.count()
