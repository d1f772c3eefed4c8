"""Shared streaming-sink plumbing.

One definition of the foreachBatch writer block (checkpoint + update
mode + optional availableNow trigger) — it was copy-pasted nine times
across the sinks (round-8 review) and any change to the sink contract
had to land in all of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["start_foreach_batch", "multiplicity_delta", "merged_multiplicities"]


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


def multiplicity_delta(
    pre, keyed, key_cols: list[str], broadcast_max_keys: int = 2_000_000
):
    """Increment-probe join for KEYED-MULTIPLICITY state (round-13
    review: quality.py and profile.py carried line-for-line copies of
    this machinery, and a defensive-read fix had already been
    hand-propagated to one but not the other — one definition now).

    ``keyed``: this batch's per-key counts (key_cols..., _d).
    ``pre``: the pre-batch state table (key_cols..., n) or None.
    Returns (key_cols..., _d, _old) with _old = the stored
    multiplicity of exactly the increment-touched keys — the stored
    side is semi-reduced by BROADCASTING the touched keys before the
    join (the CLAUDE.md incremental-probe discipline: the state table
    is corpus-sized, the increment is not; without the hint a
    stats-less lazy frame can draw a sort-merge plan that shuffles
    the whole state every micro-batch).  The hint presumes a BOUNDED
    micro-batch; a backfill/bootstrap batch whose touched-key set
    exceeds ``broadcast_max_keys`` (round-13 ADVICE: e.g. the
    profiler touches every distinct (col, value) pair of the batch)
    falls back to the un-hinted semi-join — slower per batch, but it
    cannot blow the driver/broadcast memory limit the way a forced
    multi-GB broadcast build would.  Eagerly checkpointed: every
    caller consumes it in at least two SEPARATE actions (delta
    statistics + the merge commit), the several-actions pin rule."""
    import pyspark.sql.functions as F

    if pre is not None:
        touched = keyed.select(*key_cols)
        if keyed.limit(broadcast_max_keys).count() >= broadcast_max_keys:
            old = pre.join(touched, key_cols, "left_semi")
        else:
            old = pre.join(F.broadcast(touched), key_cols, "left_semi")
        joined = keyed.join(old, key_cols, "left").select(
            *key_cols,
            "_d",
            F.coalesce(F.col("n"), F.lit(0)).alias("_old"),
        )
    else:
        joined = keyed.select(
            *key_cols, "_d", F.lit(0).cast("bigint").alias("_old")
        )
    return joined.localCheckpoint(eager=True)


def merged_multiplicities(joined, key_cols: list[str]):
    """(key_cols..., n = _old + _d) — the merge rows every
    multiplicity consumer commits."""
    import pyspark.sql.functions as F

    return joined.select(
        *key_cols,
        (F.col("_old") + F.col("_d")).cast("bigint").alias("n"),
    )
