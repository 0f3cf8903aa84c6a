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
    from eventsgateway_spark.shipping import ship_package

    ship_package(df.sparkSession)  # state fn pickles by module reference
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


# ---------------------------------------------------------------------------
# transformWithState variant (Spark 4 arbitrary-stateful v2)
# ---------------------------------------------------------------------------

try:  # PySpark >= 4.0
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotalsProcessor(StatefulProcessor):
        """Same running-totals semantics as ``_running_totals``, on the
        transformWithState API: typed value state, explicit lifecycle,
        RocksDB-backed state store (changelog-checkpointed at scale —
        the v2 API's operational win over HDFS-snapshot state)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterable[pd.DataFrame]:
            te, tv = self._totals.get() if self._totals.exists() else (0, 0.0)
            batch_events = 0
            for pdf in rows:
                batch_events += len(pdf)
                te += len(pdf)
                tv += float(pdf["value"].sum())
            self._totals.update((te, tv))
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "batch_events": [batch_events],
                    "total_events": [te],
                    "total_value": [tv],
                }
            )

        def close(self) -> None:
            pass

    def running_totals_tws(df: DataFrame, key_col: str = "key") -> DataFrame:
        """transformWithState flavor of :func:`running_totals`. Requires
        the RocksDB state store provider (set
        ``spark.sql.streaming.stateStore.providerClass`` to
        ``...state.RocksDBStateStoreProvider`` on the session) and the
        ``google.protobuf`` Python package (the v2 API's worker↔state-
        server protocol; absent in this container, present on standard
        cluster images — the test skips accordingly)."""
        return (
            df.withColumnRenamed(key_col, "key")
            .groupBy("key")
            .transformWithStateInPandas(
                statefulProcessor=RunningTotalsProcessor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )

except ImportError:  # pragma: no cover — older PySpark
    RunningTotalsProcessor = None  # type: ignore[assignment]

    def running_totals_tws(df: DataFrame, key_col: str = "key") -> DataFrame:
        raise NotImplementedError("transformWithState requires PySpark >= 4.0")
