"""Python DataSource connector (sources/pyds.py): the open-consumer
read surface over snapshot tables — manifest contract, time travel,
pruned-schema reads, opt-in filter pushdown, empty tables, vacuumed
versions."""

from __future__ import annotations

import re

import pyspark.sql.functions as F
import pytest

from ros_sql_spark.sources.pyds import SnapshotDataSource
from ros_sql_spark.sources.snapshot import (
    snapshot_commit,
    snapshot_read,
    snapshot_vacuum,
)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(SnapshotDataSource)
    return spark


def _mk(spark, path, n=120):
    df = spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("text"),
        F.array(
            (F.col("id") % 7).cast("float"), F.lit(0.5).cast("float")
        ).alias("vec"),
    )
    snapshot_commit(df, path)
    return df


def test_pyds_reads_head_and_matches_native(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "tbl")
    _mk(spark, t)
    got = spark.read.format("rosql_snapshot").load(t)
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in snapshot_read(spark, t).collect())
    assert a == b and len(a) == 120
    # one input partition per committed data file
    assert got.rdd.getNumPartitions() >= 1


def test_pyds_time_travel_and_vacuumed_version(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "tbl")
    _mk(spark, t, n=100)
    snapshot_commit(
        spark.range(100, 150).select(
            F.col("id").alias("doc_id"),
            F.lit("x").alias("text"),
            F.array(F.lit(1.0).cast("float"), F.lit(2.0).cast("float")).alias(
                "vec"
            ),
        ),
        t,
        mode="append",
    )
    assert spark.read.format("rosql_snapshot").load(t).count() == 150
    v1 = spark.read.format("rosql_snapshot").option("version", "1").load(t)
    assert v1.count() == 100
    snapshot_vacuum(spark, t, keep_last=1)
    with pytest.raises(Exception, match="not in retained versions"):
        spark.read.format("rosql_snapshot").option("version", "1").load(
            t
        ).count()


def test_pyds_projection_and_sparkside_filter(registered, tmp_path):
    """Base reader (no pushFilters): filters evaluate Spark-side but the
    result is still exact; the pruned read schema reaches the pyarrow
    column list (a 1-column projection over the 3-column table)."""
    spark = registered
    t = str(tmp_path / "tbl")
    _mk(spark, t)
    q = (
        spark.read.format("rosql_snapshot")
        .load(t)
        .filter(F.col("doc_id") >= 110)
        .select("doc_id")
    )
    assert sorted(r.doc_id for r in q.collect()) == list(range(110, 120))


def test_pyds_pushdown_variant_removes_spark_filter(registered, tmp_path):
    """.option("pushdown","true") under the engine session conf: the
    supported comparisons evaluate row-exactly inside the worker and
    the executed plan carries NO residual Filter node."""
    spark = registered
    if (
        spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
        != "true"
    ):
        pytest.skip("filter pushdown conf off in this session")
    t = str(tmp_path / "tbl")
    _mk(spark, t)
    q = (
        spark.read.format("rosql_snapshot")
        .option("pushdown", "true")
        .load(t)
        .filter((F.col("doc_id") >= 110) & F.col("text").isNotNull())
        .select("doc_id")
    )
    assert sorted(r.doc_id for r in q.collect()) == list(range(110, 120))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"\bFilter ", plan), plan


def test_pyds_empty_table_schema_true(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "tbl")
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    snapshot_commit(empty, t)
    got = spark.read.format("rosql_snapshot").load(t)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["doc_id", "text"]
