"""Inline pipeline metrics via Spark's Observation API.

A 100 TB job cannot afford a second scan just to learn "how many rows
survived the filter" or "how many nulls did ingest produce" — and
driver-side `df.count()` probes double the I/O bill. `df.observe`
attaches named aggregate expressions to a point IN the plan; they are
computed incrementally by the same tasks that run the query and cost
nothing beyond the arithmetic. This is the engine's answer to oamap's
eager per-operation visibility (every oamap op returned concrete
arrays you could len()): the plan stays lazy, the metrics ride along.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named metric expressions at this point of the plan.

    Returns (df, observation); read ``observation.get`` AFTER the
    first action on the returned frame. Metrics must be aggregate
    expressions without distinct/order-dependence (Spark's Observation
    contract — they merge per task)."""
    obs = Observation(name)
    return df.observe(obs, *[c.alias(n) for n, c in metrics.items()]), obs
