"""Stream-stream joins (SURVEY.md §2.2 streaming rows — absent in the
reference, which has no query layer at all; this is the engine
extension closing the streaming×join cell of the capability matrix).

Spark's stream-stream join keeps both sides' unmatched rows in state
until the watermark says the match window has passed.  Unbounded state
is the failure mode at 100 TB — so this wrapper REQUIRES the two
ingredients that bound it (Structured Streaming's own preconditions for
state cleanup):

- a watermark on BOTH sides, and
- a time-range join condition (|left_ts − right_ts| ≤ max_lag).

State per key is then O(rows within watermark+lag horizon), independent
of stream length.  The join itself is Spark's streaming symmetric hash
join — keyed state co-partitioned on the equi-key, no custom shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["stream_stream_join"]


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "1 hour",
    max_lag: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked, time-bounded stream-stream equi-join.

    ``on``: equi-join key columns present on both sides.  Rows match
    when keys are equal AND ``right_ts`` lies within ``± max_lag`` of
    ``left_ts`` — the range condition is what lets Spark evict state,
    so it is mandatory, not optional.  ``how``: inner (exact, emitted as
    matches arrive) or left_outer/right_outer/full_outer (null-padded
    rows emit only once the watermark closes the match window).

    Column naming: the right side's ts and key columns are suffixed
    ``_r`` so downstream code (and the batch twin used in tests) sees
    one unambiguous schema.

    Outer-join operational notes (verified in tests/test_streaming.py):
    the GLOBAL watermark is the MIN across both sides' watermark
    operators (default ``multipleWatermarkPolicy``) — a side that stops
    receiving events pins the watermark and unmatched rows never flush;
    and state eviction runs one micro-batch BEHIND the event-time high
    mark, so null-padded rows for batch N's unmatched rows emit no
    earlier than batch N+2.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    # suffix right columns that collide with left
    collisions = set(left.columns) & set(right.columns)
    for c in collisions:
        rw = rw.withColumnRenamed(c, f"{c}_r")
    cond = None
    for k in on:
        if k not in left.columns:
            raise ValueError(f"join key {k!r} missing on the left side")
        if k not in collisions:
            # a key absent on the right would make F.col(k) == F.col(k)
            # — trivially true, silently degenerating the equi-join
            # into a time-range-only CROSS join with exploding state
            # (round-8 review); fail loudly instead
            if k not in right.columns:
                raise ValueError(
                    f"join key {k!r} missing on the right side "
                    f"(right columns: {right.columns})"
                )
        e = F.col(k) == F.col(f"{k}_r" if k in collisions else k)
        cond = e if cond is None else cond & e
    rts = f"{right_ts}_r" if right_ts in collisions else right_ts
    lag = F.expr(f"INTERVAL {max_lag}")
    cond = (
        cond
        & (F.col(rts) >= F.col(left_ts) - lag)
        & (F.col(rts) <= F.col(left_ts) + lag)
    )
    return lw.join(rw, cond, how)
