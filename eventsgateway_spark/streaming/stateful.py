"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.5 Q16 streaming side — the seam for operators Spark's
built-in windows can't express).

The demonstration operator is a per-key running counter with
cumulative value sum — the stateful generalization of the reference's
Prometheus counters (metrics/metrics.go:59-66): unlike a windowed
count, it emits the running total per micro-batch and carries exact
state across batches via the state store.

Scale posture: state is partitioned by the grouping key across
executors (one shuffle), the per-group pandas batch is Arrow-backed,
and state size is O(distinct keys) — bounded by construction here
(2 longs per key). For unbounded key spaces pair with a timeout
(``GroupStateTimeout.ProcessingTimeTimeout``) to expire idle keys.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, batch_events bigint, total_events bigint, total_value double"
STATE_SCHEMA = "total_events bigint, total_value double"


def _running_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (total_events, total_value) = state.get if state.exists else (0, 0.0)
    batch_events = 0
    for pdf in pdfs:
        batch_events += len(pdf)
        total_events += len(pdf)
        total_value += float(pdf["value"].sum())
    state.update((total_events, total_value))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "batch_events": [batch_events],
            "total_events": [total_events],
            "total_value": [total_value],
        }
    )


def running_totals(df: DataFrame, key_col: str = "key") -> DataFrame:
    """Per-key cumulative (count, value-sum) across micro-batches.
    Input needs columns (``key_col``, value:double); output one row per
    key per batch with batch + lifetime totals."""
    return (
        df.withColumnRenamed(key_col, "key")
        .groupBy("key")
        .applyInPandasWithState(
            _running_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
