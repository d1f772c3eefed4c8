"""Dataset maintenance: sized writes + small-file compaction.

Covers sources/maintenance.py: write_dataset file hygiene,
dataset_stats census, and compact_dataset's contract — fragmented
partitions merge, healthy partitions' files are byte-for-byte
untouched, data is multiset-identical, and the compaction read is
partition-pruned (never a full-store scan)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from ros_sql_spark.sources.io import load_table
from ros_sql_spark.sources.maintenance import (
    compact_dataset,
    dataset_stats,
    write_dataset,
)
from tests.conftest import SF_SMALL


def _files(root):
    out = {}
    for dirpath, _, names in os.walk(root):
        for n in names:
            if n.startswith("_") or n.startswith("."):
                continue
            p = os.path.join(dirpath, n)
            out[p] = (os.path.getsize(p), os.path.getmtime(p))
    return out


def _digest(spark, path):
    df = spark.read.parquet(path)
    row = (
        df.select(
            F.sum(F.xxhash64(*sorted(df.columns)).cast("decimal(38,0)")).alias("h"),
            F.count(F.lit(1)).alias("n"),
        )
    ).first()
    return (row["h"], row["n"])


def _fragmented_store(spark, tmp_path, dates=4, files_per_date=6):
    """A date-partitioned store where some partitions are fragmented
    into many tiny files (repartition(n) before partitionBy → every
    task writes into every partition) and one partition is healthy
    (single file)."""
    ev = (
        load_table(spark, SF_SMALL, "events")
        .withColumn("event_date", F.to_date("ts"))
    )
    days = [r[0] for r in ev.select("event_date").distinct().orderBy("event_date").limit(dates).collect()]
    frag = ev.filter(F.col("event_date").isin(days[:-1])).repartition(
        files_per_date
    )
    frag.write.mode("overwrite").partitionBy("event_date").parquet(
        str(tmp_path / "store")
    )
    healthy = ev.filter(F.col("event_date") == days[-1]).coalesce(1)
    healthy.write.mode("append").partitionBy("event_date").parquet(
        str(tmp_path / "store")
    )
    return str(tmp_path / "store"), days


def test_write_dataset_one_file_per_partition(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = str(tmp_path / "ds")
    write_dataset(
        ev, path, partition_by=["event_date"], cluster_by=["ts_ns"]
    )
    stats = dataset_stats(spark, path)
    assert stats and all(s.n_files == 1 for s in stats)
    # row cap splits a partition's single task into multiple files
    path2 = str(tmp_path / "ds2")
    write_dataset(
        ev,
        path2,
        partition_by=["event_date"],
        max_records_per_file=5,
    )
    assert any(s.n_files > 1 for s in dataset_stats(spark, path2))
    assert _digest(spark, path) == _digest(spark, path2)


def test_compact_dataset_merges_only_fragmented_partitions(spark, tmp_path):
    store, days = _fragmented_store(spark, tmp_path)
    before_digest = _digest(spark, store)
    before = dataset_stats(spark, store)
    assert sum(1 for s in before if s.n_files > 1) == len(days) - 1

    healthy_dir = [s.rel_dir for s in before if s.n_files == 1]
    healthy_files_before = {
        p: m
        for p, m in _files(store).items()
        if any(d in p for d in healthy_dir)
    }

    summary = compact_dataset(spark, store, target_file_bytes=1 << 30)
    assert summary["partitions_compacted"] == len(days) - 1
    assert summary["skipped_healthy"] == 1

    after = dataset_stats(spark, store)
    assert all(s.n_files == 1 for s in after), after
    assert _digest(spark, store) == before_digest

    # healthy partition: same files, same mtimes — not rewritten
    healthy_files_after = {
        p: m
        for p, m in _files(store).items()
        if any(d in p for d in healthy_dir)
    }
    assert healthy_files_after == healthy_files_before

    # idempotent: second run finds nothing to do
    assert compact_dataset(spark, store, target_file_bytes=1 << 30)[
        "partitions_compacted"
    ] == 0


def test_compact_read_is_partition_pruned(spark, tmp_path):
    """The touched-partition selection must prune at the scan — a
    predicate on a derived expression would silently full-scan the
    store at 100 TB."""
    from ros_sql_spark.sources.maintenance import _touched_predicate

    store, days = _fragmented_store(spark, tmp_path)
    small = [s for s in dataset_stats(spark, store) if s.n_files > 1]
    df = spark.read.parquet(store)
    plan = (
        df.filter(
            _touched_predicate(["event_date"], [s.rel_dir for s in small])
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), plan


def test_compact_unpartitioned_root(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents").repartition(8)
    path = str(tmp_path / "flat")
    docs.write.mode("overwrite").parquet(path)
    before_digest = _digest(spark, path)
    assert dataset_stats(spark, path)[0].n_files == 8
    summary = compact_dataset(spark, path, target_file_bytes=1 << 30)
    assert summary["partitions_compacted"] == 1
    assert dataset_stats(spark, path)[0].n_files == 1
    assert _digest(spark, path) == before_digest
