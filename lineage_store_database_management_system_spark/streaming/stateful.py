"""Custom stateful streaming operator via ``applyInPandasWithState``
(extension layer; the reference has no streaming at all, SURVEY §2.6).

``running_user_totals`` keeps one state row per user (count, sum) and
emits the updated totals for every user touched in each micro-batch —
the canonical shape for any custom stateful operator (dedup-by-key,
rate limiting, per-entity model state) that the built-in windowed
aggregations can't express.

Scale design: state is partitioned by the grouping key across the
state store (RocksDB-backed on a real cluster), Arrow batches bound
per-group memory, and ``GroupStateTimeout`` would evict idle keys for
unbounded key domains (here: no timeout — the user domain is small and
bounded; at 100 TB keyspace you set ProcessingTimeTimeout and drop
idle state).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, s = state.get
    else:
        n, s = 0, 0.0
    for pdf in pdfs:
        n += int(len(pdf))
        s += float(pdf["value"].fillna(0.0).sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [round(s, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained as explicit
    group state; emits the post-batch totals of every user seen in the
    batch. Drained with availableNow over static input this equals the
    batch ``groupBy(user_id).agg(count, round(sum))`` — asserted in
    tests/test_operators.py."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
