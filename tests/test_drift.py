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


def test_drift_monitor_survives_compaction(spark, tmp_path):
    """Mid-stream maintenance on the daily table: watermark + meta
    counters carried through compaction (the quality/profile
    contract, asserted for the drift twin too — round 13)."""
    import pyspark.sql.functions as F

    from ros_sql_spark.sources.snapshot import (
        snapshot_compact,
        snapshot_versions,
    )
    from ros_sql_spark.streaming.drift import (
        drift_ingest_batch,
        drift_report_read,
    )

    store = str(tmp_path / "d")
    day = 86_400_000_000_000
    b0 = [(0 * day + 5, 10.0), (1 * day + 7, 20.0)]
    b1 = [(1 * day + 9, 5.0), (2 * day + 1, 40.0)]
    b2 = [(0 * day + 8, 15.0)]
    schema = "ts_ns bigint, value double"
    for b, rows in enumerate((b0, b1)):
        drift_ingest_batch(
            spark.createDataFrame(rows, schema), b, store
        )
    snapshot_compact(
        spark, f"{store}/daily", target_files=1, cluster_by=["day"]
    )
    v = snapshot_versions(spark, f"{store}/daily")[-1]
    drift_ingest_batch(spark.createDataFrame(b1, schema), 1, store)
    assert snapshot_versions(spark, f"{store}/daily")[-1] == v
    n = drift_ingest_batch(spark.createDataFrame(b2, schema), 2, store)
    assert n == 3
    rep = {
        r["day"]: r for r in drift_report_read(spark, store).collect()
    }
    # day sums survived the compaction + post-compaction fold
    got = {d: float(rep[d]["cusum"]) for d in rep}
    daily = {0: 25.0, 1: 25.0, 2: 40.0}
    t = sum(daily.values())
    cum, want = 0.0, {}
    for i, d in enumerate(sorted(daily)):
        cum += daily[d]
        want[d] = 3 * cum - (i + 1) * t
    assert got == want
