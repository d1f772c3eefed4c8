"""Continuous drift monitor (streaming/drift.py): the running CUSUM
report equals qx62's batch computation over everything ingested, at
EVERY batch boundary; increment-only state merge + meta counters;
redelivery idempotence; the real foreachBatch stream."""

from __future__ import annotations

from decimal import Decimal

import pyspark.sql.functions as F

from ros_sql_spark.functions.parity import money
from ros_sql_spark.operators.drift import cusum_scores
from ros_sql_spark.sources.io import load_table
from ros_sql_spark.sources.snapshot import snapshot_meta, snapshot_read
from ros_sql_spark.streaming.drift import (
    drift_ingest_batch,
    drift_ingest_stream,
    drift_report_read,
)
from tests.conftest import SF_SMALL

_DAY_NS = 86400000000000


def _events(spark):
    return load_table(spark, SF_SMALL, "events").select(
        "event_id", "ts_ns", "value"
    )


def _batch_reference(df, k=3):
    """qx62's computation over the given rows — the SAME operator the
    monitor uses, fed from a from-scratch daily aggregate."""
    daily = (
        df.filter(F.col("ts_ns").isNotNull())
        .groupBy(F.expr("ts_ns div 86400000000000").alias("day"))
        .agg(F.sum(money("value")).alias("_x"))
        .localCheckpoint(eager=True)
    )
    return [
        (r["day"], r["cusum"], r["score"])
        for r in cusum_scores(daily)
        .orderBy(F.desc("score"), F.asc("day"))
        .limit(k)
        .collect()
    ]


def test_drift_stream_equals_batch_at_every_boundary(spark, tmp_path):
    """Three id-split batches; after EACH fold the monitor's top-3
    equals the batch recompute over the union so far — value-exact
    (the statistic is pure exact arithmetic shared via
    operators/drift.py)."""
    store = str(tmp_path / "drift")
    ev = _events(spark)
    cuts = [(0, 600), (600, 1300), (1300, 10**9)]
    seen = None
    for bid, (lo, hi) in enumerate(cuts):
        part = ev.filter(
            (F.col("event_id") >= lo) & (F.col("event_id") < hi)
        )
        drift_ingest_batch(part, bid, store)
        seen = part if seen is None else seen.unionByName(part)
        got = [
            (r["day"], r["cusum"], r["score"])
            for r in drift_report_read(spark, store).collect()
        ]
        assert got == _batch_reference(seen), f"batch {bid}"


def test_drift_state_and_counters(spark, tmp_path):
    """The daily state holds exact per-day sums; n_days/total ride the
    manifest meta (increment-only arithmetic) and agree with a full
    recompute; redelivery of a committed batch is a no-op."""
    store = str(tmp_path / "drift")
    ev = _events(spark)
    b0 = ev.filter(F.col("event_id") < 900)
    b1 = ev.filter(F.col("event_id") >= 900)
    n0 = drift_ingest_batch(b0, 0, store)
    n1 = drift_ingest_batch(b1, 1, store)
    assert n1 >= n0
    # redelivery: same batch id again — state version must not move
    from ros_sql_spark.sources.snapshot import snapshot_versions

    v_before = snapshot_versions(spark, f"{store}/daily")
    assert drift_ingest_batch(b1, 1, store) == n1
    assert snapshot_versions(spark, f"{store}/daily") == v_before
    # state == from-scratch daily aggregate, value-exact
    want = {
        r["day"]: r["s"]
        for r in ev.filter(F.col("ts_ns").isNotNull())
        .groupBy(F.expr("ts_ns div 86400000000000").alias("day"))
        .agg(F.sum(money("value")).cast("decimal(30,2)").alias("s"))
        .collect()
    }
    got = {
        r["day"]: r["s"]
        for r in snapshot_read(spark, f"{store}/daily").collect()
    }
    assert got == want
    meta = snapshot_meta(spark, f"{store}/daily")
    assert int(meta["n_days"]) == len(want)
    assert Decimal(meta["total"]) == sum(want.values())


def test_drift_real_stream(spark, tmp_path):
    """The real foreachBatch path: rate-limited file stream over the
    events slice folds into the same state, and the final report
    equals the batch reference."""
    store = str(tmp_path / "drift")
    src_dir = str(tmp_path / "src")
    ev = _events(spark)
    ev.repartition(3).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = drift_ingest_stream(
        stream, store, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    got = [
        (r["day"], r["cusum"], r["score"])
        for r in drift_report_read(spark, store).collect()
    ]
    assert got == _batch_reference(ev)
