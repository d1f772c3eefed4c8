"""Real JDBC roundtrips against embedded Derby (the in-container stand-in
for the reference's SQLAlchemy backends)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ros_sql_spark.sources.io import load_table
from ros_sql_spark.sources.jdbc import (
    DERBY_DRIVER,
    derby_url,
    jdbc_idempotent_batch,
    read_jdbc,
    write_jdbc,
)
from ros_sql_spark.streaming.replay import stream_events
from tests.conftest import SF_SMALL


@pytest.fixture()
def db(tmp_path):
    return derby_url(str(tmp_path / "db"))


def _events(spark):
    # derived ts (timestamp) dropped: the ns long is the lossless record
    return load_table(spark, SF_SMALL, "events").select(
        "event_id", "ts_ns", "user_id", "event_type", "value", "props"
    )


def test_events_roundtrip_through_jdbc(spark, db):
    ev = _events(spark)
    write_jdbc(ev, db, "events", mode="overwrite", driver=DERBY_DRIVER)
    back = read_jdbc(spark, db, "events", driver=DERBY_DRIVER)
    assert back.count() == 1000
    a = sorted(map(repr, (tuple(r) for r in ev.collect())))
    b = sorted(map(repr, (tuple(r) for r in back.collect())))
    assert a == b  # ns-exact through the database


def test_partitioned_parallel_read(spark, db):
    ev = _events(spark)
    write_jdbc(ev, db, "events", mode="overwrite", driver=DERBY_DRIVER)
    back = read_jdbc(
        spark, db, "events", driver=DERBY_DRIVER,
        partition_column="event_id", lower_bound=0, upper_bound=1000,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000


def test_jdbc_sink_idempotent_under_redelivery(spark, db):
    ev = _events(spark)
    jdbc_idempotent_batch(ev, 0, db, "sink", ["event_id"], driver=DERBY_DRIVER)
    jdbc_idempotent_batch(ev, 0, db, "sink", ["event_id"], driver=DERBY_DRIVER)
    assert read_jdbc(spark, db, "sink", driver=DERBY_DRIVER).count() == 1000
    more = ev.withColumn("event_id", F.col("event_id") + 10_000)
    jdbc_idempotent_batch(more, 1, db, "sink", ["event_id"], driver=DERBY_DRIVER)
    assert read_jdbc(spark, db, "sink", driver=DERBY_DRIVER).count() == 2000


def test_streaming_to_jdbc_exactly_once(spark, db, tmp_path):
    """The full R12→R7 pipeline: file-source stream → foreachBatch JDBC
    sink, redelivered from a fresh checkpoint → no duplicates."""
    def run(ck):
        q = (
            stream_events(spark, f"{SF_SMALL}/events.parquet")
            .select("event_id", "ts_ns", "user_id", "event_type", "value")
            .writeStream.foreachBatch(
                lambda df, bid: jdbc_idempotent_batch(
                    df, bid, db, "stream_sink", ["event_id"], driver=DERBY_DRIVER
                )
            )
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("ck1")
    assert read_jdbc(spark, db, "stream_sink", driver=DERBY_DRIVER).count() == 1000
    run("ck2")  # full redelivery
    assert read_jdbc(spark, db, "stream_sink", driver=DERBY_DRIVER).count() == 1000
