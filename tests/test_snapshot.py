"""Manifest-based snapshot tables: atomic commit, snapshot isolation,
time travel, optimistic concurrency, predicate replacement, vacuum."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ros_sql_spark.sources.snapshot import (
    SnapshotConflict,
    snapshot_commit,
    snapshot_read,
    snapshot_vacuum,
    snapshot_versions,
)


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(tag).alias("tag"), (F.col("id") % 3).alias("part")
    )


def test_commit_read_roundtrip_and_versions(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = snapshot_commit(_df(spark, 0, 100, "a"), t)
    assert v1 == 1
    assert snapshot_versions(spark, t) == [1]
    got = snapshot_read(spark, t)
    assert got.count() == 100
    assert {r.tag for r in got.select("tag").distinct().collect()} == {"a"}

    v2 = snapshot_commit(_df(spark, 0, 50, "b"), t)
    assert v2 == 2
    # latest is the overwrite; v1 still readable (time travel)
    assert snapshot_read(spark, t).count() == 50
    assert snapshot_read(spark, t, version=1).count() == 100


def test_snapshot_isolation_under_concurrent_commit(spark, tmp_path):
    """A reader's resolved DataFrame must keep returning the OLD
    snapshot's rows even after a new commit lands (file list pinned at
    resolve time)."""
    t = str(tmp_path / "tbl")
    snapshot_commit(_df(spark, 0, 40, "old"), t)
    reader = snapshot_read(spark, t)  # resolves v1's file list NOW
    snapshot_commit(_df(spark, 0, 7, "new"), t)  # v2 lands mid-"query"
    assert reader.count() == 40
    assert {r.tag for r in reader.select("tag").distinct().collect()} == {"old"}
    assert snapshot_read(spark, t).count() == 7


def test_optimistic_concurrency_conflict(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snapshot_commit(_df(spark, 0, 10, "a"), t)
    # writer thinks the table is at v0 but it moved to v1 -> conflict
    with pytest.raises(SnapshotConflict, match="expected version"):
        snapshot_commit(_df(spark, 0, 5, "b"), t, expected_version=0)
    # correct expectation succeeds
    assert snapshot_commit(_df(spark, 0, 5, "b"), t, expected_version=1) == 2


def test_replace_where_partition_swap(spark, tmp_path):
    """replace_where rewrites one 'partition' and keeps the rest; the
    previous snapshot is untouched."""
    t = str(tmp_path / "tbl")
    snapshot_commit(_df(spark, 0, 90, "a"), t)
    patch = _df(spark, 1000, 1030, "patched").withColumn("part", F.lit(1))
    snapshot_commit(patch, t, replace_where="part = 1")

    latest = snapshot_read(spark, t)
    assert latest.filter("part = 1").count() == 30
    assert {
        r.tag for r in latest.filter("part = 1").select("tag").distinct().collect()
    } == {"patched"}
    # untouched parts intact (ids 0..89 with part != 1 -> 60 rows)
    assert latest.filter("part != 1").count() == 60
    assert {
        r.tag
        for r in latest.filter("part != 1").select("tag").distinct().collect()
    } == {"a"}
    # time travel: v1 still has the original 90
    assert snapshot_read(spark, t, version=1).count() == 90


def test_vacuum_deletes_only_unreachable(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snapshot_commit(_df(spark, 0, 30, "a"), t)
    snapshot_commit(_df(spark, 0, 20, "b"), t)
    snapshot_commit(_df(spark, 0, 10, "c"), t)
    deleted = snapshot_vacuum(spark, t, keep_last=1)
    assert deleted  # v1/v2 data gone
    assert snapshot_versions(spark, t) == [3]
    assert snapshot_read(spark, t).count() == 10
    with pytest.raises(FileNotFoundError):
        snapshot_read(spark, t, version=1)


def test_vacuum_noop_when_everything_kept(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snapshot_commit(_df(spark, 0, 10, "a"), t)
    assert snapshot_vacuum(spark, t, keep_last=5) == []
    assert snapshot_read(spark, t).count() == 10


def test_read_missing_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="no snapshots"):
        snapshot_read(spark, str(tmp_path / "nope"))
