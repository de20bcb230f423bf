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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4.x StatefulProcessor API)
# ---------------------------------------------------------------------------
# The successor to applyInPandasWithState: named state variables
# (ValueState / ListState / MapState), TTL, and timers, with the state
# store pluggable (RocksDB for 100 TB keyspaces). The runtime path
# needs the `protobuf` package (the Python worker speaks the state
# protocol over protobuf), which is absent in this container and may
# not be installed — so the operator is import-gated:
# `user_profile_processor()` raises ImportError with a clear message
# when the dependency is missing, and the pytest skips. The
# applyInPandasWithState operators above remain the tested path; this
# is the forward-compatible one.

def transform_with_state_available() -> bool:
    """True when the transformWithState Python worker can start
    (protobuf present)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


PROFILE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_types", T.LongType()),
    ]
)


def _profile_processor():
    """Build the StatefulProcessor class lazily — importing
    pyspark.sql.streaming.stateful_processor is cheap, but the class
    is only usable when protobuf exists, so construction is deferred
    behind the availability check."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserProfile(StatefulProcessor):
        """Per-user profile state machine: total events (ValueState) +
        distinct event types with per-type counts (MapState). Emits
        the updated profile row per key per micro-batch (update
        semantics); after an availableNow drain the final row per key
        equals the batch groupBy image — the oracle-able contract."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.count = handle.getValueState("count", "n BIGINT")
            self.types = handle.getMapState("types", "t STRING", "c BIGINT")

        def handleInputRows(self, key, rows, timer_values):
            n = self.count.get()[0] if self.count.exists() else 0
            for pdf in rows:
                n += len(pdf)
                for t, c in pdf["event_type"].value_counts().items():
                    prev = (
                        self.types.getValue((t,))[0]
                        if self.types.containsKey((t,))
                        else 0
                    )
                    self.types.updateValue((t,), (prev + int(c),))
            self.count.update((n,))
            n_types = sum(1 for _ in self.types.keys())
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "n_types": [n_types]}
            )

        def close(self) -> None:
            pass

    return UserProfile


def user_profile_stateful(events: DataFrame) -> DataFrame:
    """Per-user profile via transformWithStateInPandas (ValueState +
    MapState). Raises ImportError when the protobuf runtime dependency
    is unavailable (see module note)."""
    if not transform_with_state_available():
        raise ImportError(
            "transformWithStateInPandas needs the `protobuf` package "
            "(the streaming Python worker's state protocol); not "
            "installed in this environment — use running_user_counts "
            "(applyInPandasWithState) instead"
        )
    proc = _profile_processor()()
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=PROFILE_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
