"""Continuous rollup (streaming/rollup.py): the incrementally-maintained
time-bucket store must converge to the batch aggregate, across multiple
micro-batches whose windows overlap (so upserts genuinely replace
earlier partial rows), and re-running a batch must be idempotent."""

from __future__ import annotations

import pyspark.sql.functions as F

from ros_sql_spark.sources.io import load_table
from ros_sql_spark.streaming.rollup import (
    continuous_rollup,
    hourly_rollup,
    rollup_upsert_batch,
)
from tests.conftest import SF_SMALL


def _canon(df):
    return sorted(
        map(
            repr,
            (
                tuple(r)
                for r in df.select(
                    "w_start", "event_type", "n", F.round("total", 6).alias("t")
                ).collect()
            ),
        )
    )


def test_continuous_rollup_converges_to_batch(spark, tmp_path):
    events = load_table(spark, SF_SMALL, "events")
    batch_expected = _canon(hourly_rollup(events))

    # Split the events into 3 unordered files -> 3 micro-batches whose
    # windows interleave in time, forcing real upserts (not just appends).
    src = str(tmp_path / "stream_src")
    events.withColumn("_b", F.pmod("event_id", F.lit(3))).repartition(
        "_b"
    ).drop("_b").write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store = str(tmp_path / "rollup_store")
    q = continuous_rollup(
        stream,
        store,
        str(tmp_path / "ckpt"),
        watermark="3650 days",  # upsert correctness here; eviction tested in stateful
    )
    q.awaitTermination(180)
    assert not q.isActive

    got = _canon(spark.read.parquet(store).drop("w_date"))
    assert got == batch_expected


def test_rollup_upsert_idempotent(spark, tmp_path):
    events = load_table(spark, SF_SMALL, "events")
    rows = hourly_rollup(events)
    store = str(tmp_path / "store")
    rollup_upsert_batch(rows, 0, store)
    once = _canon(spark.read.parquet(store).drop("w_date"))
    rollup_upsert_batch(rows, 0, store)  # replayed batch: same keys replace
    twice = _canon(spark.read.parquet(store).drop("w_date"))
    assert once == twice == _canon(rows)
