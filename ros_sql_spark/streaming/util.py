"""Shared streaming-sink plumbing.

One definition of the foreachBatch writer block (checkpoint + update
mode + optional availableNow trigger) — it was copy-pasted nine times
across the sinks (round-8 review) and any change to the sink contract
had to land in all of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["start_foreach_batch"]


def start_foreach_batch(
    stream: DataFrame,
    body,
    checkpoint_path: str,
    available_now: bool = True,
    output_mode: str = "update",
):
    """Start ``stream`` through a ``foreachBatch`` sink: the body owns
    delivery semantics (idempotency, watermark tags), this owns the
    writer wiring.  ``output_mode`` is declarative only for
    foreachBatch (the body sees every batch either way) but kept
    explicit so intent reads at the call site."""
    writer = (
        stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_path)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
