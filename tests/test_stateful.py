"""Custom stateful streaming operators vs their batch twins."""

from __future__ import annotations

import pyspark.sql.functions as F

from ros_sql_spark.sources.io import load_table
from ros_sql_spark.streaming.replay import stream_events
from ros_sql_spark.streaming.stateful import running_user_stats, streaming_dedup
from tests.conftest import SF_SMALL

EVENTS_PATH = f"{SF_SMALL}/events.parquet"


def _drain(q):
    q.awaitTermination(180)
    assert not q.isActive


def test_running_stats_converge_to_batch_totals(spark, tmp_path):
    """After draining the stream, the last update per user must equal the
    batch per-user totals (state accumulated correctly across batches)."""
    stream = running_user_stats(stream_events(spark, EVENTS_PATH))
    q = (
        stream.writeStream.format("memory")
        .queryName("stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    # memory sink in update mode appends each emission; the final state is
    # the max n_events per user
    final = (
        spark.sql("SELECT * FROM stats")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
    )
    got = {
        (r.user_id, r.n_events, round(r.total_value, 6)) for r in final.collect()
    }
    batch = load_table(spark, SF_SMALL, "events")
    expect = {
        (r.user_id, r.n, round(r.s, 6))
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == expect


def test_streaming_dedup_first_occurrence(spark, tmp_path):
    """Duplicated key stream → exactly one row per key in the sink."""
    ev = stream_events(spark, EVENTS_PATH).withColumn(
        "dup_key", F.col("event_id") % 100
    )
    q = (
        streaming_dedup(ev, ["dup_key"])
        .writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckd"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    out = spark.sql("SELECT dup_key, count(*) AS c FROM dedup GROUP BY dup_key")
    rows = out.collect()
    assert len(rows) == 100
    assert all(r.c == 1 for r in rows)
