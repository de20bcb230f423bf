"""Custom stateful streaming operators via applyInPandasWithState —
the escape hatch for semantics Spark's built-in stateful operators
don't cover (oamap's "any user function" ethos, §7.7). State lives in
the state store per group key; processing is Arrow-batched pandas."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COUNT_STATE_SCHEMA = T.StructType([T.StructField("n", T.LongType())])
COUNT_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _count_events(key, batches: Iterator[pd.DataFrame], state: GroupState):
    """Running per-user event count kept in GroupState; emits the
    updated total each trigger."""
    n = state.get[0] if state.exists else 0
    for pdf in batches:
        n += len(pdf)
    state.update((n,))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})


def running_user_counts(events: DataFrame) -> DataFrame:
    """Per-user running event counts as a custom stateful operator.
    Built-in `groupBy().count()` covers this exact case — the point is
    the harness: GroupState schema, Arrow batching, update-mode
    emission — which generalizes to arbitrary per-key state machines
    (fraud windows, per-user rate limits, CEP-ish patterns)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _count_events,
        outputStructType=COUNT_OUT_SCHEMA,
        stateStructType=COUNT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
