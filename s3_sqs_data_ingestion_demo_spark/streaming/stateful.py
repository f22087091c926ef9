"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference keeps no stream state at all (its dedup is per-batch
only, SURVEY §2.4 T3/T4).  These operators add cross-batch state the
Spark-native way: per-key state lives in the streaming state store,
checkpointed with the query, recovered on restart.

Scale notes: state is partitioned by key across executors; Arrow
batches bound Python memory; TTL/timeout config prevents unbounded
state growth for first-seen dedup.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_stats_tws(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Cumulative per-key stats on Spark 4's ``transformWithState``
    API — typed value state with optional TTL (the state-store-native
    eviction knob ``applyInPandasWithState`` lacks).  Functionally
    identical to ``running_user_stats``; kept side-by-side so both
    custom-stateful APIs are covered.

    Runtime requirement: the TWS driver worker imports
    ``google.protobuf`` (its state-server protocol) — present on real
    clusters, absent in this container, so the test for this operator
    skips when protobuf is missing and ``running_user_stats`` is the
    locally-exercised path.
    """
    try:  # fail loudly at plan time, not inside the streaming worker
        import google.protobuf.descriptor  # noqa: F401, PLC0415
    except ImportError as exc:
        raise RuntimeError(
            "transformWithStateInPandas requires the google.protobuf "
            "package (not bundled in this environment); use "
            "running_user_stats (applyInPandasWithState) instead"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (  # noqa: PLC0415
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "agg", "n long, s double", ttlDurationMs=state_ttl_ms
            )

        def handleInputRows(self, key, rows, timer_values):
            cur = self._state.get() if self._state.exists() else (0, 0.0)
            n, s = cur
            for pdf in rows:
                n += len(pdf)
                s += float(pdf[value_col].sum())
            self._state.update((n, s))
            yield pd.DataFrame(
                {key_col: [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
            )

        def close(self) -> None:
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningStats(),
        outputStructType=f"{key_col} long, n_events long, sum_value double",
        outputMode="Update",
        timeMode="None",
    )


def running_user_stats(df: DataFrame, key_col: str = "user_id", value_col: str = "value") -> DataFrame:
    """Cumulative per-key (count, sum) maintained across micro-batches.

    Emits one updated row per key per batch (update semantics); state
    is (n, sum) per key — constant size, checkpoint-recovered.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
        )

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} long, n_events long, sum_value double",
        stateStructType="n long, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def first_seen_keys(df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Streaming distinct: emit each key only the first time it is ever
    seen across the whole stream (cross-batch, checkpoint-durable) —
    the streaming complement of exact dedup.

    State per key is a single flag; for TTL-bounded state swap the
    timeout conf to ``ProcessingTimeTimeout`` and set a timeout in
    ``fn`` — kept unbounded here to keep semantics exact.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        count = 0
        for pdf in pdfs:
            count += len(pdf)
        if not state.exists:
            state.update((True,))
            yield pd.DataFrame({key_col: [key[0]], "n_rows_first_batch": [count]})

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} long, n_rows_first_batch long",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
