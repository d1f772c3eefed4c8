"""Continuous data-quality monitor (streaming/quality.py): running
report == from-scratch batch report over everything ingested, at every
batch boundary; cross-batch uniqueness; single-commit crash atomicity;
redelivery idempotence; the real foreachBatch stream."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ros_sql_spark.streaming.quality import (
    quality_ingest_batch,
    quality_ingest_stream,
    quality_report_read,
)

_SCHEMA = "k1 bigint, k2 bigint, qty double, ref bigint"


def _checks():
    return {
        "k1_not_null": F.col("k1").isNull(),
        "qty_in_1_50": (
            F.col("qty").isNull() | (F.col("qty") < 1) | (F.col("qty") > 50)
        ),
    }


def _batch_report(spark, rows, ref_rows):
    """From-scratch reference over the union: the qx53-class batch
    computation, inline."""
    df = spark.createDataFrame(rows, _SCHEMA)
    ref = {r[0] for r in ref_rows}
    out = {
        "k1_not_null": sum(1 for r in rows if r[0] is None),
        "qty_in_1_50": sum(
            1 for r in rows if r[2] is None or r[2] < 1 or r[2] > 50
        ),
        "ref_fk": sum(1 for r in rows if r[3] is not None and r[3] not in ref),
        "_n_rows": len(rows),
    }
    from collections import Counter

    c = Counter((r[0], r[1]) for r in rows if r[0] is not None and r[1] is not None)
    out["k1_k2_unique"] = sum(n - 1 for n in c.values() if n > 1)
    assert df.count() == len(rows)  # schema sanity
    return out


REF = [(1,), (2,), (3,), (4,)]

B0 = [
    (1, 1, 10.0, 1),
    (1, 2, 5.0, 2),
    (2, 1, 99.0, 9),      # qty + fk violations
    (None, 1, 10.0, 3),   # null key: row check fires, uniqueness skips
    (3, 1, 10.0, None),   # null fk: NOT an fk violation
]
B1 = [
    (1, 1, 10.0, 1),      # cross-batch dup of (1,1)
    (1, 1, 0.5, 2),       # in-batch dup of (1,1) + qty violation
    (4, 1, 10.0, 4),
]
B2 = [
    (1, 2, 10.0, 1),      # cross-batch dup of (1,2)
    (5, None, 10.0, 7),   # null k2: uniqueness skips; fk violation
]


@pytest.mark.slow  # measured 16s (marker policy: >=10s)
def test_quality_monitor_equals_batch_at_every_boundary(spark, tmp_path):
    store = str(tmp_path / "q")
    ref = spark.createDataFrame(REF, "ref bigint")
    seen = []
    for b, rows in enumerate((B0, B1, B2)):
        seen += rows
        got = quality_ingest_batch(
            spark.createDataFrame(rows, _SCHEMA),
            b,
            store,
            ["k1", "k2"],
            _checks(),
            fk=("ref", ref),
        )
        assert got == _batch_report(spark, seen, REF), f"batch {b}"
    # the report frame has qx53's shape and matches the dict
    rep = {
        r.constraint: (r.n_violations, r.passed)
        for r in quality_report_read(spark, store).collect()
    }
    want = _batch_report(spark, seen, REF)
    want.pop("_n_rows")
    assert {k: v[0] for k, v in rep.items()} == want
    assert all((v == 0) == p for v, p in rep.values())
    # cross-batch dups actually engaged: (1,1) x3 and (1,2) x2 -> 3
    assert want["k1_k2_unique"] == 3

    # redelivery of batch 1: version AND report untouched
    from ros_sql_spark.sources.snapshot import snapshot_versions

    v = snapshot_versions(spark, f"{store}/counts")[-1]
    again = quality_ingest_batch(
        spark.createDataFrame(B1, _SCHEMA), 1, store,
        ["k1", "k2"], _checks(), fk=("ref", ref),
    )
    assert snapshot_versions(spark, f"{store}/counts")[-1] == v
    assert {k: v2 for k, v2 in again.items() if k != "_n_rows"} == want


def test_quality_monitor_crash_is_atomic(spark, tmp_path, monkeypatch):
    """The monitor has ONE commit per batch: a crash during it leaves
    state AND counters at the pre-batch version together, and the
    replay lands exactly the un-crashed result."""
    import ros_sql_spark.streaming.quality as q

    store = str(tmp_path / "q")
    quality_ingest_batch(
        spark.createDataFrame(B0, _SCHEMA), 0, store, ["k1", "k2"], _checks()
    )
    real = q.snapshot_merge
    state = {"crashed": False}

    def crashing(*a, **kw):
        if not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("injected crash in the state commit")
        return real(*a, **kw)

    monkeypatch.setattr(q, "snapshot_merge", crashing)
    with pytest.raises(RuntimeError):
        quality_ingest_batch(
            spark.createDataFrame(B1, _SCHEMA), 1, store,
            ["k1", "k2"], _checks(),
        )
    monkeypatch.setattr(q, "snapshot_merge", real)
    got = quality_ingest_batch(
        spark.createDataFrame(B1, _SCHEMA), 1, store, ["k1", "k2"], _checks()
    )
    want = _batch_report(spark, B0 + B1, REF)
    for k in ("ref_fk",):
        want.pop(k)
    assert got == want


def test_quality_monitor_real_stream(spark, tmp_path):
    src, store, ck = (
        str(tmp_path / "src"),
        str(tmp_path / "q"),
        str(tmp_path / "ck"),
    )
    for rows in (B0, B1, B2):
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    ref = spark.createDataFrame(REF, "ref bigint")
    q = quality_ingest_stream(
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src),
        store,
        ck,
        ["k1", "k2"],
        _checks(),
        fk=("ref", ref),
    )
    q.awaitTermination(240)
    assert not q.isActive
    want = _batch_report(spark, B0 + B1 + B2, REF)
    want.pop("_n_rows")
    got = {
        r.constraint: r.n_violations
        for r in quality_report_read(spark, store).collect()
    }
    assert got == want


def test_quality_monitor_survives_compaction(spark, tmp_path):
    """Mid-stream maintenance: compacting (key-clustering) the counts
    table between batches must carry BOTH the batch watermark (no
    re-ingest) and the meta counters (no balance loss) — the
    carried-forward contract of snapshot_compact, composed with the
    monitor."""
    from ros_sql_spark.sources.snapshot import snapshot_compact

    store = str(tmp_path / "q")
    seen = []
    for b, rows in enumerate((B0, B1)):
        seen += rows
        quality_ingest_batch(
            spark.createDataFrame(rows, _SCHEMA), b, store,
            ["k1", "k2"], _checks(),
        )
    snapshot_compact(
        spark, f"{store}/counts", target_files=2, cluster_by=["k1"]
    )
    # redelivery of batch 1 after compaction: still a no-op
    from ros_sql_spark.sources.snapshot import snapshot_versions

    v = snapshot_versions(spark, f"{store}/counts")[-1]
    quality_ingest_batch(
        spark.createDataFrame(B1, _SCHEMA), 1, store, ["k1", "k2"], _checks()
    )
    assert snapshot_versions(spark, f"{store}/counts")[-1] == v
    # and batch 2 folds correctly on the compacted state
    seen += B2
    got = quality_ingest_batch(
        spark.createDataFrame(B2, _SCHEMA), 2, store, ["k1", "k2"], _checks()
    )
    want = _batch_report(spark, seen, REF)
    want.pop("ref_fk")
    assert got == want
