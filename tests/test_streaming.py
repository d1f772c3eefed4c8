"""Streaming twins (SURVEY.md §5.2 layer 3): batch↔streaming equivalence
for session/tumbling windows, q16 cross-check, and sink idempotency
under batch replay."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ros_sql_spark.plans.queries import q16_sessionize
from ros_sql_spark.sources.io import load_table
from ros_sql_spark.streaming.replay import (
    idempotent_sink_batch,
    session_counts,
    stream_events,
    tumbling_counts,
    write_idempotent,
)
from tests.conftest import SF_SMALL

EVENTS_PATH = f"{SF_SMALL}/events.parquet"


def _drain(q):
    q.awaitTermination(120)
    assert not q.isActive


def test_streaming_sessions_equal_batch(spark, tmp_path):
    batch = session_counts(load_table(spark, SF_SMALL, "events"))
    bres = sorted(map(repr, (tuple(r) for r in batch.collect())))

    stream = session_counts(stream_events(spark, EVENTS_PATH))
    out = str(tmp_path / "sessions_out")
    q = (
        stream.writeStream.format("memory")
        .queryName("sess")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    sres = sorted(
        map(repr, (tuple(r) for r in spark.sql("SELECT * FROM sess").collect()))
    )
    assert sres == bres


def test_session_counts_match_q16(spark):
    """Distinct session_window sessions per user == q16's lag-based
    n_sessions (two formulations of the same operator)."""
    per_user = (
        session_counts(load_table(spark, SF_SMALL, "events"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )
    a = {(r.user_id, r.n_sessions) for r in per_user.collect()}
    b = {
        (r.user_id, r.n_sessions)
        for r in q16_sessionize(spark, SF_SMALL).collect()
    }
    assert a == b


def test_streaming_tumbling_equal_batch(spark, tmp_path):
    batch = tumbling_counts(load_table(spark, SF_SMALL, "events"))
    bres = sorted(map(repr, (tuple(r) for r in batch.collect())))
    q = (
        tumbling_counts(stream_events(spark, EVENTS_PATH))
        .writeStream.format("memory")
        .queryName("tumb")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_tumb"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    sres = sorted(
        map(repr, (tuple(r) for r in spark.sql("SELECT * FROM tumb").collect()))
    )
    assert sres == bres


def test_sink_idempotent_under_replay(spark, tmp_path):
    """R7/R13 sink contract: replaying the same batch adds zero rows."""
    sink = str(tmp_path / "sink")
    ev = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "value")
    idempotent_sink_batch(ev, 0, sink, ["event_id"])
    n1 = spark.read.parquet(sink).count()
    idempotent_sink_batch(ev, 0, sink, ["event_id"])  # redelivery
    n2 = spark.read.parquet(sink).count()
    assert n1 == n2 == 1000
    # a genuinely new batch still appends
    more = ev.withColumn("event_id", F.col("event_id") + 1_000_000)
    idempotent_sink_batch(more, 1, sink, ["event_id"])
    assert spark.read.parquet(sink).count() == 2000


def test_streaming_pipeline_end_to_end(spark, tmp_path):
    """stream_events → write_idempotent drains the whole table into the
    sink exactly once, and a second run (fresh checkpoint, same sink)
    appends nothing."""
    sink = str(tmp_path / "sink2")
    q = write_idempotent(
        stream_events(spark, EVENTS_PATH), sink, str(tmp_path / "ck1")
    )
    _drain(q)
    assert spark.read.parquet(sink).count() == 1000
    q = write_idempotent(
        stream_events(spark, EVENTS_PATH), sink, str(tmp_path / "ck2")
    )
    _drain(q)
    assert spark.read.parquet(sink).count() == 1000  # exactly-once


def test_stream_stream_join_matches_batch_twin(spark, tmp_path):
    """Watermarked stream-stream equi-join (clicks ⋈ purchases per user
    within ±30 min) equals the same join on the batch frames — inner
    stream-stream joins are exact; the watermark+range condition only
    bounds state."""
    import pyspark.sql.functions as F

    from ros_sql_spark.sources.io import load_table
    from ros_sql_spark.streaming.joins import stream_stream_join
    from ros_sql_spark.streaming.replay import stream_events
    from tests.conftest import SF_SMALL

    ev = stream_events(spark, f"{SF_SMALL}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = stream_stream_join(
        clicks, purchases, on=["user_id"], max_lag="30 minutes"
    )
    q = (
        joined.select("event_id", "event_id_r")
        .writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.event_id, r.event_id_r)
        for r in spark.sql("SELECT * FROM ssj").collect()
    }

    bev = load_table(spark, SF_SMALL, "events")
    bc = bev.filter(F.col("event_type") == "click")
    bp = bev.filter(F.col("event_type") == "purchase")
    # withWatermark is a documented no-op on batch frames, so the SAME
    # operator body is its own batch twin.
    want = {
        (r.event_id, r.event_id_r)
        for r in stream_stream_join(
            bc, bp, on=["user_id"], max_lag="30 minutes"
        )
        .select("event_id", "event_id_r")
        .collect()
    }
    assert got == want and len(got) > 0
