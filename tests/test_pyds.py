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


def _stream_into(spark, src, t, ck):
    q = (
        spark.readStream.schema("doc_id bigint, text string")
        .parquet(src)
        .writeStream.format("rosql_snapshot")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start(t)
    )
    q.awaitTermination(180)


def test_pyds_stream_sink_exactly_once_append(registered, tmp_path):
    """writeStream.format("rosql_snapshot"): executor-written staged
    parquet + one driver manifest per batch — contents match the
    source, versions advance per batch, a restart on the same
    checkpoint with no new data commits nothing, a delta appends only
    itself, and the staging area is swept after every commit."""
    import os

    spark = registered
    src, t, ck = (
        str(tmp_path / "src"),
        str(tmp_path / "tbl"),
        str(tmp_path / "ck"),
    )
    spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("text"),
    ).repartition(3).write.parquet(src)

    _stream_into(spark, src, t, ck)
    got = snapshot_read(spark, t)
    assert got.count() == 300 and got.select("doc_id").distinct().count() == 300

    from ros_sql_spark.sources.snapshot import snapshot_versions

    v1 = snapshot_versions(spark, t)
    _stream_into(spark, src, t, ck)  # restart, no new data: full no-op
    assert snapshot_versions(spark, t) == v1

    spark.range(300, 400).select(
        F.col("id").alias("doc_id"), F.lit("z").alias("text")
    ).write.mode("append").parquet(src)
    _stream_into(spark, src, t, ck)
    assert snapshot_read(spark, t).count() == 400
    assert len(snapshot_versions(spark, t)) == len(v1) + 1
    # the connector's own reader sees the sink's output too
    assert spark.read.format("rosql_snapshot").load(t).count() == 400
    staging = os.path.join(t, "_stream_staging")
    assert not os.path.isdir(staging) or os.listdir(staging) == []


def test_pyds_staged_commit_replay_and_schema_guard(registered, tmp_path):
    """snapshot_commit_staged_files (the sink's pure-Python commit):
    a replayed batch id deletes the staged file and commits nothing;
    a staged batch with a different schema raises instead of
    corrupting the table contract."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as papq

    from ros_sql_spark.sources.snapshot import (
        snapshot_commit_staged_files,
        snapshot_versions,
    )

    spark = registered
    t = str(tmp_path / "tbl")
    schema_json = (
        spark.createDataFrame([], "doc_id bigint, text string").schema.json()
    )

    def stage(rows):
        d = str(tmp_path / "stage")
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, f"part-{len(os.listdir(d))}.parquet")
        papq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            p,
        )
        return p

    assert snapshot_commit_staged_files(t, [stage([(1, "a")])], schema_json, 0)
    p = stage([(2, "b")])
    assert not snapshot_commit_staged_files(t, [p], schema_json, 0)  # replay
    assert not os.path.exists(p)  # staged file reclaimed
    assert snapshot_read(spark, t).count() == 1
    assert snapshot_versions(spark, t) == [1]

    other = spark.createDataFrame([], "doc_id bigint, n bigint").schema.json()
    p2 = stage([(3, "c")])
    with pytest.raises(ValueError, match="schema mismatch"):
        snapshot_commit_staged_files(t, [p2], other, 1)


def test_pyds_sink_interops_with_native_maintenance(registered, tmp_path):
    """A sink-written table is a first-class snapshot table: native
    append, compact and vacuum compose with it."""
    from ros_sql_spark.sources.snapshot import (
        snapshot_compact,
        snapshot_vacuum,
        snapshot_versions,
    )

    spark = registered
    src, t, ck = (
        str(tmp_path / "src"),
        str(tmp_path / "tbl"),
        str(tmp_path / "ck"),
    )
    spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit("w").alias("text")
    ).write.parquet(src)
    _stream_into(spark, src, t, ck)
    snapshot_commit(
        spark.createDataFrame([(1000, "n")], "doc_id bigint, text string"),
        t,
        mode="append",
    )
    snapshot_compact(spark, t, target_files=1)
    snapshot_vacuum(spark, t, keep_last=1)
    assert snapshot_read(spark, t).count() == 101
    assert len(snapshot_versions(spark, t)) == 1


def test_pyds_batch_writer_append_and_overwrite(registered, tmp_path):
    """df.write.format("rosql_snapshot"): append carries the previous
    files by reference, overwrite publishes exactly this write, old
    versions stay readable until vacuum, and the native reader and the
    connector reader agree."""
    from ros_sql_spark.sources.snapshot import snapshot_versions

    spark = registered
    t = str(tmp_path / "tbl")
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit("a").alias("text")
    )
    df.write.format("rosql_snapshot").mode("append").save(t)
    df.selectExpr("doc_id + 100 AS doc_id", "'b' AS text").write.format(
        "rosql_snapshot"
    ).mode("append").save(t)
    assert snapshot_read(spark, t).count() == 200
    assert snapshot_versions(spark, t) == [1, 2]

    spark.range(0, 7).select(
        F.col("id").alias("doc_id"), F.lit("o").alias("text")
    ).write.format("rosql_snapshot").mode("overwrite").save(t)
    assert snapshot_read(spark, t).count() == 7
    assert snapshot_read(spark, t, version=2).count() == 200  # time travel
    assert spark.read.format("rosql_snapshot").load(t).count() == 7


def test_pyds_stream_reader_append_cdc(registered, tmp_path):
    """spark.readStream.format("rosql_snapshot"): version-offset change
    stream — each restart reads exactly the appended delta; a
    non-append version transition (compaction rewrote files) fails the
    stream instead of double-reading."""
    from ros_sql_spark.sources.snapshot import snapshot_compact

    spark = registered
    t = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit("a").alias("text")
    )
    snapshot_commit(df, t)

    def drain():
        q = (
            spark.readStream.format("rosql_snapshot")
            .load(t)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return q

    drain()
    assert spark.read.parquet(out).count() == 100
    snapshot_commit(
        df.selectExpr("doc_id + 200 AS doc_id", "text"), t, mode="append"
    )
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 200  # only the delta was appended
    assert got.select("doc_id").distinct().count() == 200

    # compaction rewrites files: the next incremental read must FAIL
    # (append-only contract), not silently re-read rewritten data
    snapshot_commit(
        df.selectExpr("doc_id + 400 AS doc_id", "text"), t, mode="append"
    )
    snapshot_compact(spark, t, target_files=1)
    with pytest.raises(Exception, match="APPEND-ONLY|StreamingQuery"):
        q = (
            spark.readStream.format("rosql_snapshot")
            .load(t)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        if q.exception() is not None:
            raise q.exception()


def test_pyds_sink_written_files_survive_vacuum_without_compaction(
    registered, tmp_path
):
    """Round-10 review (reproduced data loss): the staged commit must
    record Hadoop-QUALIFIED paths ("file:/...") like every native
    commit — scheme-less manifest entries read as dead in vacuum's
    live-set test and the CURRENT version's sink-written files were
    deleted.  Vacuum directly after a sink write (no compaction in
    between) must leave the table fully readable."""
    from ros_sql_spark.sources.snapshot import snapshot_vacuum

    spark = registered
    src, t, ck = (
        str(tmp_path / "src"),
        str(tmp_path / "tbl"),
        str(tmp_path / "ck"),
    )
    spark.range(0, 50).select(
        F.col("id").alias("doc_id"), F.lit("w").alias("text")
    ).write.parquet(src)
    snapshot_commit(
        spark.createDataFrame([(999, "n")], "doc_id bigint, text string"), t
    )
    _stream_into(spark, src, t, ck)
    assert snapshot_read(spark, t).count() == 51
    snapshot_vacuum(spark, t, keep_last=1)
    assert snapshot_read(spark, t).count() == 51  # nothing live deleted

    # batch writer path too
    spark.range(100, 120).select(
        F.col("id").alias("doc_id"), F.lit("b").alias("text")
    ).write.format("rosql_snapshot").mode("append").save(t)
    snapshot_vacuum(spark, t, keep_last=1)
    assert snapshot_read(spark, t).count() == 71


def test_pyds_pushdown_keeps_float_filters_spark_side(registered, tmp_path):
    """Round-10 review: Arrow evaluates every NaN comparison false
    where Spark orders NaN above all numbers — float/double
    comparisons must stay Spark-side so NaN rows survive a pushed-down
    read identically to the native path."""
    spark = registered
    if (
        spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
        != "true"
    ):
        pytest.skip("filter pushdown conf off in this session")
    t = str(tmp_path / "tbl")
    rows = [(1, 1.0), (2, float("nan")), (3, 9.0)]
    snapshot_commit(
        spark.createDataFrame(rows, "doc_id bigint, score double"), t
    )
    q = (
        spark.read.format("rosql_snapshot")
        .option("pushdown", "true")
        .load(t)
        .filter(F.col("score") > 5.0)
        .select("doc_id")
    )
    got = sorted(r.doc_id for r in q.collect())
    want = sorted(
        r.doc_id
        for r in snapshot_read(spark, t)
        .filter(F.col("score") > 5.0)
        .select("doc_id")
        .collect()
    )
    assert got == want  # NaN row treated identically to the native scan
    # integer filters still push: no residual Spark Filter node
    q2 = (
        spark.read.format("rosql_snapshot")
        .option("pushdown", "true")
        .load(t)
        .filter(F.col("doc_id") >= 3)
        .select("doc_id")
    )
    assert sorted(r.doc_id for r in q2.collect()) == [3]
    plan = q2._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"\bFilter ", plan), plan


def test_pyds_pushdown_timestamp_pushes_to_worker(registered, tmp_path):
    """Round-12 (closes round-11's allowlist fallback): a timestamp
    range filter — the most common predicate on event tables — must be
    FULLY handled by the connector (no residual Spark Filter node), by
    building the boundary scalar in the file column's own (unit, tz)
    type instead of letting pyarrow infer one from the datetime (the
    round-11 kernel-mismatch crash)."""
    import datetime as dt

    spark = registered
    if (
        spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
        != "true"
    ):
        pytest.skip("filter pushdown conf off in this session")
    t = str(tmp_path / "tbl")
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0)),
        (2, dt.datetime(2024, 6, 1, 12, 0, 0)),
        (3, dt.datetime(2025, 1, 1, 0, 0, 0)),
    ]
    snapshot_commit(
        spark.createDataFrame(rows, "doc_id bigint, ts timestamp"), t
    )
    cut = dt.datetime(2024, 3, 1)
    q = (
        spark.read.format("rosql_snapshot")
        .option("pushdown", "true")
        .load(t)
        .filter(F.col("ts") > F.lit(cut))
        .select("doc_id")  # ts filtered but NOT projected — the
        # pruned-read + fully-pushed-filter combination
    )
    got = sorted(r.doc_id for r in q.collect())
    want = sorted(
        r.doc_id
        for r in snapshot_read(spark, t)
        .filter(F.col("ts") > F.lit(cut))
        .select("doc_id")
        .collect()
    )
    assert got == want == [2, 3]
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"\bFilter ", plan), (
        "timestamp filter must be fully pushed (no Spark-side "
        "re-evaluation):\n" + plan
    )


def _commit_ns_file(tmp_path, ns_values):
    """Hand-write a TIMESTAMP(NANOS) parquet (third-party producer
    shape) and publish it as a snapshot table."""
    import pyarrow as pa
    import pyarrow.parquet as papq
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from ros_sql_spark.sources.snapshot import snapshot_commit_staged_files

    t = str(tmp_path / "ns_tbl")
    staged = str(tmp_path / "staged.parquet")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, len(ns_values) + 1), pa.int64()),
            "ts": pa.array(ns_values, pa.timestamp("ns", tz="UTC")),
        }
    )
    papq.write_table(tbl, staged, store_schema=False)
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("ts", TimestampType())]
    )
    assert snapshot_commit_staged_files(t, [staged], schema.json())
    return t


def test_pyds_pushdown_timestamp_ns_floor_boundary(registered, tmp_path):
    """The pushed comparison must match Spark's post-FLOOR µs domain
    exactly on a ns-grain file: the advice repro −1500 ns floors to
    −2 µs, so `ts >= −2 µs` keeps it, `ts > −2 µs` drops it, and
    `ts == −2 µs` matches the whole [−2000, −1001] ns bucket — all
    evaluated worker-side with no residual Filter."""
    import datetime as dt

    spark = registered
    if (
        spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
        != "true"
    ):
        pytest.skip("filter pushdown conf off in this session")
    # ns values: floors to µs = [-2, -1, -1, 0, 0, 1]
    t = _commit_ns_file(tmp_path, [-1500, -999, -1000, 0, 999, 1001])
    cut = dt.datetime(1969, 12, 31, 23, 59, 59, 999998, tzinfo=dt.timezone.utc)

    def ids(cond):
        q = (
            spark.read.format("rosql_snapshot")
            .option("pushdown", "true")
            .load(t)
            .filter(cond)
            .select("doc_id")
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert not re.search(r"\bFilter ", plan), plan
        return sorted(r.doc_id for r in q.collect())

    assert ids(F.col("ts") >= F.lit(cut)) == [1, 2, 3, 4, 5, 6]
    assert ids(F.col("ts") > F.lit(cut)) == [2, 3, 4, 5, 6]
    assert ids(F.col("ts") == F.lit(cut)) == [1]
    assert ids(F.col("ts") <= F.lit(cut)) == [1]
    assert ids(F.col("ts") < F.lit(cut)) == []
    # and the same rows as the unpushed connector read (conform-floored)
    plain = (
        spark.read.format("rosql_snapshot")
        .load(t)
        .filter(F.col("ts") >= F.lit(cut))
        .select("doc_id")
    )
    assert sorted(r.doc_id for r in plain.collect()) == [1, 2, 3, 4, 5, 6]


def test_pyds_remote_scheme_named_error(registered, tmp_path):
    """A remote scheme must fail with the named local-paths-only error
    on BOTH the read and the sink path — not the misleading 'not a
    snapshot table (no versions)'."""
    spark = registered
    with pytest.raises(Exception, match="local.*file.*paths"):
        spark.read.format("rosql_snapshot").load(
            "s3://bucket/tbl"
        ).collect()
    df = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(Exception, match="local.*file.*paths"):
        df.write.format("rosql_snapshot").mode("append").save(
            "hdfs://nn/tbl"
        )


def test_conform_batches_floors_ns_to_us(registered):
    """Round-11 review: pyarrow's ns→µs cast truncates toward zero,
    but Spark/DuckDB read parquet NANOS floored — a pre-epoch
    timestamp with sub-µs nanos must floor (−1500 ns → −2 µs, not
    −1 µs).  Spark-written tables are µs-grain so the branch is
    dormant there, but the conform primitive is shared by every
    reader and must match native semantics for any producer."""
    import datetime as dt

    import pyarrow as pa
    from pyspark.sql.types import LongType, StructField, StructType, TimestampType

    from ros_sql_spark.sources.pyds import _conform_batches

    ns = pa.array([-1500, -999, -1000, 0, 999, 1001], pa.timestamp("ns"))
    ids = pa.array([1, 2, 3, 4, 5, 6], pa.int64())
    batch = pa.RecordBatch.from_arrays([ids, ns], ["doc_id", "ts"])
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("ts", TimestampType())]
    )
    out = list(_conform_batches(iter([batch]), schema))
    assert len(out) == 1
    got = out[0].column(1).cast(pa.int64()).to_pylist()
    assert got == [-2, -1, -1, 0, 0, 1]  # floored, not truncated
    # and the µs values round-trip as the datetimes Spark would show
    assert out[0].column(1).to_pylist()[0] == dt.datetime(
        1969, 12, 31, 23, 59, 59, 999998, tzinfo=dt.timezone.utc
    )


def test_conform_batches_floors_nested_ns(registered):
    """Round-12 advice: a timestamp[ns] nested inside a struct or list
    column must get the same FLOORED ns→µs conversion as a top-level
    one — the plain cast fallback truncated toward zero, reintroducing
    the pre-epoch 1 µs off-by-one for third-party producers."""
    import pyarrow as pa
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from ros_sql_spark.sources.pyds import _conform_batches

    ns_t = pa.timestamp("ns")
    st = pa.array(
        [{"t": -1500, "k": 1}, None, {"t": 999, "k": 3}],
        pa.struct([("t", ns_t), ("k", pa.int64())]),
    )
    ls = pa.array([[-1500, -999], None, [1001]], pa.list_(ns_t))
    ids = pa.array([1, 2, 3], pa.int64())
    batch = pa.RecordBatch.from_arrays([ids, st, ls], ["doc_id", "s", "a"])
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField(
                "s",
                StructType(
                    [
                        StructField("t", TimestampType()),
                        StructField("k", LongType()),
                    ]
                ),
            ),
            StructField("a", ArrayType(TimestampType())),
        ]
    )
    out = list(_conform_batches(iter([batch]), schema))
    assert len(out) == 1
    s_col, a_col = out[0].column(1), out[0].column(2)
    # struct: floored (not truncated), container nulls preserved
    assert s_col[1].as_py() is None
    assert int(s_col[0]["t"].cast(pa.int64()).as_py()) == -2
    assert int(s_col[2]["t"].cast(pa.int64()).as_py()) == 0
    assert s_col[0]["k"].as_py() == 1 and s_col[2]["k"].as_py() == 3
    # list: floored elementwise, null entry preserved
    assert a_col[1].as_py() is None
    flat = a_col.flatten().cast(pa.int64()).to_pylist()
    assert flat == [-2, -1, 1]
    # and a SLICED nested batch (offsets not starting at 0) conforms too
    sliced = batch.slice(1)
    out2 = list(_conform_batches(iter([sliced]), schema))
    a2 = out2[0].column(2)
    assert a2[0].as_py() is None
    assert a2.flatten().cast(pa.int64()).to_pylist() == [1]


def test_pyds_pushdown_timestamp_coarse_units(registered, tmp_path):
    """The s/ms-grain branch of _ts_filter_expr: a µs-grain boundary
    that does NOT land on the file's unit must floor/ceil-adjust per
    comparison (>, >=, <, <=) and prove ==-against-unaligned is empty
    — all fully pushed, rows exactly matching the floored-µs domain
    Spark sees after conform."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as papq
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from ros_sql_spark.sources.snapshot import snapshot_commit_staged_files

    spark = registered
    if (
        spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
        != "true"
    ):
        pytest.skip("filter pushdown conf off in this session")
    t = str(tmp_path / "ms_tbl")
    staged = str(tmp_path / "staged.parquet")
    # ms counts 1..5 (i.e. 1000µs .. 5000µs)
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array([1, 2, 3, 4, 5], pa.timestamp("ms", tz="UTC")),
        }
    )
    papq.write_table(tbl, staged, store_schema=False)
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("ts", TimestampType())]
    )
    assert snapshot_commit_staged_files(t, [staged], schema.json())

    def ids(cond):
        q = (
            spark.read.format("rosql_snapshot")
            .option("pushdown", "true")
            .load(t)
            .filter(cond)
            .select("doc_id")
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert not re.search(r"\bFilter ", plan), plan
        return sorted(r.doc_id for r in q.collect())

    # unaligned boundary: 2500 µs (between rows 2 and 3)
    cut = dt.datetime(1970, 1, 1, 0, 0, 0, 2500, tzinfo=dt.timezone.utc)
    assert ids(F.col("ts") > F.lit(cut)) == [3, 4, 5]
    assert ids(F.col("ts") >= F.lit(cut)) == [3, 4, 5]
    assert ids(F.col("ts") < F.lit(cut)) == [1, 2]
    assert ids(F.col("ts") <= F.lit(cut)) == [1, 2]
    assert ids(F.col("ts") == F.lit(cut)) == []  # provably empty
    # aligned boundary: 3000 µs == row 3 exactly
    cut3 = dt.datetime(1970, 1, 1, 0, 0, 0, 3000, tzinfo=dt.timezone.utc)
    assert ids(F.col("ts") > F.lit(cut3)) == [4, 5]
    assert ids(F.col("ts") >= F.lit(cut3)) == [3, 4, 5]
    assert ids(F.col("ts") <= F.lit(cut3)) == [1, 2, 3]
    assert ids(F.col("ts") == F.lit(cut3)) == [3]


def test_ts_filter_expr_property_matches_floored_domain():
    """Property test (round 12): for EVERY unit (s/ms/us/ns), every
    comparison, and adversarial µs boundaries around the unit edges,
    _ts_filter_expr's pyarrow evaluation over raw counts must equal
    the brute-force comparison in Spark's post-conform µs domain
    (coarse units widen exactly; ns FLOORS) — negatives included."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as papq
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ros_sql_spark.sources.pyds import _ts_filter_expr

    _K = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}

    def to_us(count: int, unit: str) -> int:
        if unit == "ns":
            return count // 1000  # Python floor division == conform
        return count * _K[unit]

    _PY_OP = {
        "GreaterThan": lambda a, b: a > b,
        "GreaterThanOrEqual": lambda a, b: a >= b,
        "LessThan": lambda a, b: a < b,
        "LessThanOrEqual": lambda a, b: a <= b,
        "EqualTo": lambda a, b: a == b,
    }

    import os
    import tempfile

    tmp = tempfile.mkdtemp()

    @settings(max_examples=60, deadline=None)
    @given(
        unit=st.sampled_from(["s", "ms", "us", "ns"]),
        kind=st.sampled_from(list(_PY_OP)),
        counts=st.lists(
            st.integers(-5000, 5000), min_size=1, max_size=40
        ),
        boundary_us=st.integers(-4000, 4000),
    )
    def case(unit, kind, counts, boundary_us):
        ftype = pa.timestamp(unit, tz="UTC")
        path = os.path.join(tmp, f"t_{unit}.parquet")
        papq.write_table(
            pa.table(
                {
                    "i": pa.array(range(len(counts)), pa.int64()),
                    "ts": pa.array(counts, ftype),
                }
            ),
            path,
            store_schema=False,
        )
        ds = pads.dataset(path, format="parquet")
        expr = _ts_filter_expr(
            kind, "ts", boundary_us, ds.schema.field("ts").type
        )
        got = sorted(
            ds.to_table(filter=expr).column("i").to_pylist()
        )
        want = sorted(
            i
            for i, c in enumerate(counts)
            if _PY_OP[kind](to_us(c, unit), boundary_us)
        )
        assert got == want, (unit, kind, boundary_us, counts)

    case()


def test_conform_batches_struct_fields_matched_by_name(registered):
    """Round-12 self-review: a file whose struct fields are ORDERED
    differently than the manifest schema must conform by NAME (a
    positional match would silently swap same-typed fields); a missing
    field is a named error."""
    import pyarrow as pa
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from ros_sql_spark.sources.pyds import _conform_batches

    # file order (k, t); target order (t, k)
    st_arr = pa.array(
        [{"k": 7, "t": -1500}, {"k": 8, "t": 2000}],
        pa.struct([("k", pa.int64()), ("t", pa.timestamp("ns"))]),
    )
    batch = pa.RecordBatch.from_arrays([st_arr], ["s"])
    schema = StructType(
        [
            StructField(
                "s",
                StructType(
                    [
                        StructField("t", TimestampType()),
                        StructField("k", LongType()),
                    ]
                ),
            )
        ]
    )
    out = list(_conform_batches(iter([batch]), schema))[0]
    s = out.column(0)
    assert s[0]["k"].as_py() == 7 and s[1]["k"].as_py() == 8
    assert int(s[0]["t"].cast(pa.int64()).as_py()) == -2  # floored too
    # missing field: named error, not a silent null
    bad = pa.RecordBatch.from_arrays(
        [pa.array([{"k": 1}], pa.struct([("k", pa.int64())]))], ["s"]
    )
    with pytest.raises(ValueError, match="missing from file"):
        list(_conform_batches(iter([bad]), schema))
