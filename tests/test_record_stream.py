"""Live multi-topic recording end-to-end: multiplexed stream → demuxed
normalized stores → catalog-driven ordered playback (the reference's
whole record.py/playback.py story as one pipeline)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from ros_sql_spark.api import playback
from ros_sql_spark.sources.io import load_table
from ros_sql_spark.streaming.record import declare_topics, record_stream
from ros_sql_spark.streaming.replay import stream_events
from tests.conftest import SF_SMALL

EVENTS_PATH = f"{SF_SMALL}/events.parquet"
TOPIC_VALUES = ["click", "error", "purchase", "signup", "view"]


def _declared_schema(spark):
    # the per-topic schema = events stream schema minus the topic column
    return T.StructType(
        [f for f in stream_events(spark, EVENTS_PATH).schema.fields
         if f.name != "event_type"]
    )


def test_record_stream_then_playback(spark, tmp_path):
    store = str(tmp_path / "store")
    schema = _declared_schema(spark)
    declare_topics(store, {t: schema for t in TOPIC_VALUES}, ["event_id"])

    q = record_stream(
        stream_events(spark, EVENTS_PATH),
        topic_col="event_type",
        store_path=store,
        key_cols=["event_id"],
        checkpoint_path=str(tmp_path / "ck"),
    )
    q.awaitTermination(180)
    assert not q.isActive

    batch = load_table(spark, SF_SMALL, "events")
    total = 0
    for topic in TOPIC_VALUES:
        got = playback(spark, store, topic)
        rows = got.collect()
        expect = (
            batch.filter(F.col("event_type") == topic)
            .drop("event_type")
            .orderBy("ts_ns")
            .collect()
        )
        assert [r.event_id for r in rows] == [r.event_id for r in expect]
        total += len(rows)
    assert total == 1000  # every message landed in exactly one topic


def test_record_stream_rejects_undeclared_topic(spark, tmp_path):
    store = str(tmp_path / "store")
    schema = _declared_schema(spark)
    declare_topics(store, {"click": schema}, ["event_id"])  # only one topic
    q = record_stream(
        stream_events(spark, EVENTS_PATH),
        topic_col="event_type",
        store_path=store,
        key_cols=["event_id"],
        checkpoint_path=str(tmp_path / "ck"),
    )
    with pytest.raises(Exception, match="undeclared"):
        q.awaitTermination(180)
        q.processAllAvailable()
