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


def test_streaming_latest_state_equals_batch_q50(spark, tmp_path):
    """transformWithState changelog compaction: after draining the
    stream, the newest emission per key must equal batch
    q50_latest_state exactly (same argmax ordering: µs floor + event_id
    tiebreak).  Exercises the Spark-4 stateful API end-to-end: typed
    ValueState, RocksDB provider, update-mode upserts."""
    from ros_sql_spark.plans.queries import QUERIES
    from ros_sql_spark.streaming.stateful import streaming_latest_state

    stream = streaming_latest_state(stream_events(spark, EVENTS_PATH))
    q = (
        stream.writeStream.format("memory")
        .queryName("latest")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckl"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    # update-mode memory sink appends every upsert; the live view is the
    # row with the max (last_us, last_event_id) per key — same argmax.
    final = (
        spark.sql("SELECT * FROM latest")
        .groupBy("user_id", "event_type")
        .agg(
            F.max(
                F.struct("last_us", "last_event_id", "last_value")
            ).alias("s")
        )
        .select("user_id", "event_type", "s.last_event_id", "s.last_us", "s.last_value")
    )
    got = {tuple(r) for r in final.collect()}
    expect = {
        tuple(r) for r in QUERIES["q50_latest_state"](spark, SF_SMALL).collect()
    }
    assert got == expect


def test_streaming_latest_state_tws_gate_is_honest(spark):
    """The transformWithState variant requires protobuf (its Python
    worker protocol).  Where the package is absent the operator must
    refuse loudly at construction, not crash the query mid-stream."""
    import pytest

    from ros_sql_spark.streaming.stateful import streaming_latest_state

    try:
        from google.protobuf import descriptor  # noqa: F401
        has_protobuf = True
    except ImportError:
        has_protobuf = False
    ev = stream_events(spark, EVENTS_PATH)
    if has_protobuf:
        df = streaming_latest_state(ev, api="tws")
        assert df.isStreaming
    else:
        with pytest.raises(NotImplementedError, match="protobuf"):
            streaming_latest_state(ev, api="tws")


def test_session_assembler_closed_sessions_match_batch(spark, tmp_path):
    """Timer-based sessionizer: closed sessions (append mode, emitted
    once — by a later event or by the event-time timer) must equal the
    batch gap-sessionization restricted to sessions whose timeout
    horizon the final watermark passed.  Exercises the full custom
    state lifecycle: open-session state, EventTimeTimeout,
    state.remove() eviction."""
    from ros_sql_spark.streaming.stateful import session_assembler

    GAP_US = 30 * 60 * 1_000_000
    WM_US = 60 * 60 * 1_000_000
    stream = session_assembler(
        stream_events(spark, EVENTS_PATH), gap="30 minutes", watermark="1 hour"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cks"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = {tuple(r) for r in spark.sql("SELECT * FROM sessions").collect()}

    ev = load_table(spark, SF_SMALL, "events").select(
        "user_id", F.expr("ts_ns div 1000").alias("us"), "event_id"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    sess = (
        ev.withColumn("brk", F.when(gap > GAP_US, 1).otherwise(0))
        .withColumn("sid", F.sum("brk").over(w))
        .groupBy("user_id", "sid")
        .agg(
            F.min("us").alias("session_start_us"),
            F.max("us").alias("session_end_us"),
            F.count("*").alias("n_events"),
        )
    )
    wm_ms = (
        ev.agg(F.max("us")).collect()[0][0] - WM_US
    ) // 1000
    # closed = ended early enough that the final watermark passed its
    # timer (end//1000 + gap_ms <= watermark_ms) OR followed by a later
    # session of the same user (closed by data)
    last_sid = sess.groupBy("user_id").agg(F.max("sid").alias("max_sid"))
    expect_df = (
        sess.join(last_sid, "user_id")
        .filter(
            (F.col("sid") < F.col("max_sid"))
            | (
                F.expr("session_end_us div 1000") + F.lit(GAP_US // 1000)
                <= F.lit(wm_ms)
            )
        )
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )
    expect = {tuple(r) for r in expect_df.collect()}
    assert got == expect
    assert len(got) > 0


def test_streaming_weighted_sample_equals_batch_topk(spark, tmp_path):
    """Reservoir state after draining a multi-batch stream ≡ the batch
    per-group A-ES top-k on the same rows: the priority is one shared
    Spark expression, so equality is exact, not approximate."""
    from pyspark.sql.window import Window

    from ros_sql_spark.operators.sampling import uniform_from_id
    from ros_sql_spark.streaming.stateful import streaming_weighted_sample

    docs = load_table(spark, SF_SMALL, "documents")
    feed = str(tmp_path / "docs_feed")
    # several files -> several micro-batches -> state must merge across
    docs.repartition(4).write.parquet(feed)

    schema = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    k = 5
    latest: dict[str, list] = {}

    def grab(df, _bid):
        rows = df.collect()
        for g in {r.group for r in rows}:
            latest[g] = [
                (r.doc_id, r.priority) for r in rows if r.group == g
            ]

    q = (
        streaming_weighted_sample(stream, k=k, weight_col="n_chars")
        .writeStream.foreachBatch(grab)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckw"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)

    pri = F.round(
        F.pow(uniform_from_id("doc_id"), F.lit(1.0) / F.col("n_chars")), 9
    )
    w = Window.partitionBy("source").orderBy(F.desc("_pri"), F.asc("doc_id"))
    expect_rows = (
        docs.filter(F.col("n_chars") > 0)
        .select("source", "doc_id", pri.alias("_pri"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .collect()
    )
    expect: dict[str, list] = {}
    for r in sorted(expect_rows, key=lambda r: (r.source, -r._pri, r.doc_id)):
        expect.setdefault(r.source, []).append((r.doc_id, r._pri))
    got = {g: rows for g, rows in latest.items()}
    assert got == expect


def test_session_fn_late_event_never_regresses_end(spark):
    """Direct unit drive of the session state fn: a LATE (within-
    watermark) segment merging into the open session must extend the
    span with min/max, never regress session_end below the stored end
    (round-8 review: the old merge took the segment's hi as the new
    end, mis-splitting sessions)."""
    import pandas as pd

    from ros_sql_spark.streaming.stateful import _make_session_fn

    class FakeState:
        def __init__(self):
            self._v = None
            self.removed = False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        @property
        def hasTimedOut(self):
            return False

        def update(self, v):
            self._v = v

        def remove(self):
            self._v = None
            self.removed = True

        def getCurrentWatermarkMs(self):
            return 0

        def setTimeoutTimestamp(self, ms):
            self.timeout_ms = ms

    gap_us = 30 * 60 * 1_000_000
    fn = _make_session_fn(gap_us)
    mk = lambda mins: pd.DataFrame({"us": [m * 60 * 1_000_000 for m in mins]})

    # batch 1: events at minute 600 and 620 -> open (600, 620)
    st = FakeState()
    list(fn((1,), iter([mk([600, 620])]), st))
    assert st.get == (600 * 60 * 1_000_000, 620 * 60 * 1_000_000, 2)

    # batch 2: a LATE event at minute 605 plus an in-gap one at 640 —
    # one session spanning 600..640 with 4 events; end never regresses
    list(fn((1,), iter([mk([605, 640])]), st))
    assert st.get == (600 * 60 * 1_000_000, 640 * 60 * 1_000_000, 4)

    # a late event BELOW the stored start extends the start downward
    list(fn((1,), iter([mk([585])]), st))
    assert st.get == (585 * 60 * 1_000_000, 640 * 60 * 1_000_000, 5)


def test_session_assembler_accepts_spark_interval_spellings(spark):
    """The gap parser must accept what the session_window twin accepts
    — singular units and any case (round-8 review: '1 second' raised
    KeyError)."""
    import pytest

    from ros_sql_spark.sources.io import load_table
    from ros_sql_spark.streaming.stateful import session_assembler
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    for gap in ("1 second", "30 Minutes", "2 days", "1 hour"):
        session_assembler(ev, gap=gap)  # parse must not raise
    with pytest.raises(ValueError, match="unsupported gap unit"):
        session_assembler(ev, gap="3 fortnights")


def test_stream_stream_join_missing_key_raises(spark):
    """A join key absent on one side must fail loudly — the silent
    alternative was F.col(k) == F.col(k), a degenerate always-true
    condition turning the equi-join into a time-range cross join
    (round-8 review)."""
    import pytest

    from ros_sql_spark.sources.io import load_table
    from ros_sql_spark.streaming.joins import stream_stream_join
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    right = ev.withColumnRenamed("user_id", "uid")
    with pytest.raises(ValueError, match="missing on the right side"):
        stream_stream_join(ev, right, on=["user_id"], max_lag="30 minutes")
    left = ev.withColumnRenamed("user_id", "uid")
    with pytest.raises(ValueError, match="missing on the left side"):
        stream_stream_join(left, ev, on=["user_id"], max_lag="30 minutes")
