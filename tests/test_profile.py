"""Continuous column profiler (streaming/profile.py): running report ==
from-scratch qx52-style profile over everything ingested, at every
batch boundary; cross-batch exact distinct; single-commit crash
atomicity; redelivery idempotence; the real foreachBatch stream."""

from __future__ import annotations

import pytest

from ros_sql_spark.streaming.profile import (
    profile_ingest_batch,
    profile_ingest_stream,
    profile_report_read,
)

_SCHEMA = "id bigint, qty double, flag string"
_COLS = {"id": True, "qty": True, "flag": False}

B0 = [
    (1, 10.0, "A"),
    (2, 5.5, "B"),
    (None, 10.0, "A"),     # null id; qty 10.0 repeats in-batch
    (3, None, None),       # null qty + null flag
]
B1 = [
    (1, 10.0, "A"),        # every value a cross-batch repeat
    (4, -2.25, "C"),       # new id/qty/flag; negative min
    (None, None, "B"),
]
B2 = [
    (5, 99.75, "A"),       # new max
    (2, 5.5, "C"),
]


def _batch_profile(spark, rows):
    """From-scratch reference over the union: qx52's one-pass profile,
    computed natively (countDistinct on the RAW column — asserting the
    monitor's string-keyed state counts the same)."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(rows, _SCHEMA)
    out = {"_n_rows": len(rows)}
    for c, numeric in _COLS.items():
        agg = [
            F.sum(F.col(c).isNull().cast("bigint")).alias("nn"),
            F.countDistinct(c).alias("nd"),
        ]
        if numeric:
            agg += [
                F.min(F.col(c).cast("double")).alias("mn"),
                F.max(F.col(c).cast("double")).alias("mx"),
            ]
        r = df.agg(*agg).collect()[0]
        p = {"n_null": int(r["nn"]), "n_distinct": int(r["nd"])}
        if numeric:
            p["min"] = float(r["mn"]) if r["mn"] is not None else None
            p["max"] = float(r["mx"]) if r["mx"] is not None else None
        out[c] = p
    return out


def _norm(prof):
    """Drop absent-min/max keys so dict compare is shape-insensitive."""
    out = {}
    for k, v in prof.items():
        if k == "_n_rows":
            out[k] = int(v)
        else:
            out[k] = {
                kk: (float(vv) if kk in ("min", "max") else int(vv))
                for kk, vv in v.items()
                if vv is not None
            }
    return out


@pytest.mark.slow  # snapshot commits per batch (quality-twin class)
def test_profile_monitor_equals_batch_at_every_boundary(spark, tmp_path):
    store = str(tmp_path / "p")
    seen = []
    for b, rows in enumerate((B0, B1, B2)):
        seen += rows
        got = profile_ingest_batch(
            spark.createDataFrame(rows, _SCHEMA), b, store, _COLS
        )
        assert _norm(got) == _norm(_batch_profile(spark, seen)), f"batch {b}"
    # report frame in qx52's shape, consistent with the dict
    rep = {r.column: r for r in profile_report_read(spark, store).collect()}
    want = _batch_profile(spark, seen)
    n_rows = want.pop("_n_rows")
    assert set(rep) == set(want)
    for c, p in want.items():
        r = rep[c]
        assert r.n_rows == n_rows
        assert r.n_null == p["n_null"]
        assert r.n_distinct == p["n_distinct"]
        if _COLS[c]:
            assert r.min_num == round(p["min"], 6)
            assert r.max_num == round(p["max"], 6)
        else:
            assert r.min_num is None and r.max_num is None
    # cross-batch distinct actually engaged: id {1,2,3,4,5} = 5,
    # not the per-batch sum 3+2+2
    assert rep["id"].n_distinct == 5

    # redelivery of batch 1: version AND report untouched
    from ros_sql_spark.sources.snapshot import snapshot_versions

    v = snapshot_versions(spark, f"{store}/values")[-1]
    again = profile_ingest_batch(
        spark.createDataFrame(B1, _SCHEMA), 1, store, _COLS
    )
    assert snapshot_versions(spark, f"{store}/values")[-1] == v
    assert _norm(again) == _norm(_batch_profile(spark, seen))


def test_profile_monitor_crash_is_atomic(spark, tmp_path, monkeypatch):
    """ONE commit per batch: a crash during it leaves multiplicities
    AND counters at the pre-batch version together; the replay lands
    exactly the un-crashed result."""
    import ros_sql_spark.streaming.profile as pr

    store = str(tmp_path / "p")
    profile_ingest_batch(
        spark.createDataFrame(B0, _SCHEMA), 0, store, _COLS
    )
    real = pr.snapshot_merge
    state = {"crashed": False}

    def crashing(*a, **kw):
        if not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("injected crash in the state commit")
        return real(*a, **kw)

    monkeypatch.setattr(pr, "snapshot_merge", crashing)
    with pytest.raises(RuntimeError):
        profile_ingest_batch(
            spark.createDataFrame(B1, _SCHEMA), 1, store, _COLS
        )
    monkeypatch.setattr(pr, "snapshot_merge", real)
    got = profile_ingest_batch(
        spark.createDataFrame(B1, _SCHEMA), 1, store, _COLS
    )
    assert _norm(got) == _norm(_batch_profile(spark, B0 + B1))


@pytest.mark.slow  # real foreachBatch stream (quality-twin class)
def test_profile_monitor_real_stream(spark, tmp_path):
    src, store, ck = (
        str(tmp_path / "src"),
        str(tmp_path / "p"),
        str(tmp_path / "ck"),
    )
    for rows in (B0, B1, B2):
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    q = profile_ingest_stream(
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src),
        store,
        ck,
        _COLS,
    )
    q.awaitTermination(240)
    assert not q.isActive
    want = _batch_profile(spark, B0 + B1 + B2)
    n_rows = want.pop("_n_rows")
    rep = {r.column: r for r in profile_report_read(spark, store).collect()}
    for c, p in want.items():
        assert rep[c].n_rows == n_rows
        assert rep[c].n_null == p["n_null"]
        assert rep[c].n_distinct == p["n_distinct"]


def test_profile_negative_zero_matches_countdistinct(spark, tmp_path):
    """Round-13 review: -0.0 and 0.0 are ONE distinct value under
    Spark's countDistinct (NormalizeFloatingNumbers) — the monitor's
    string-keyed state must agree (`+ 0` canonicalization before the
    cast), or the advertised batch-equivalence contract breaks on the
    first signed zero."""
    store = str(tmp_path / "p")
    rows = [(1, 0.0, "A"), (2, -0.0, "A"), (3, -0.0, "B")]
    got = profile_ingest_batch(
        spark.createDataFrame(rows, _SCHEMA), 0, store, _COLS
    )
    assert _norm(got) == _norm(_batch_profile(spark, rows))
    assert got["qty"]["n_distinct"] == 1


def test_profile_monitor_survives_compaction(spark, tmp_path):
    """Mid-stream maintenance: compacting the values table between
    batches must carry BOTH the batch watermark (no re-ingest) and
    the meta profile (no counter loss) — the quality monitor's
    compaction contract, asserted for this twin too (round 13)."""
    from ros_sql_spark.sources.snapshot import (
        snapshot_compact,
        snapshot_versions,
    )

    store = str(tmp_path / "p")
    for b, rows in enumerate((B0, B1)):
        profile_ingest_batch(
            spark.createDataFrame(rows, _SCHEMA), b, store, _COLS
        )
    snapshot_compact(
        spark, f"{store}/values", target_files=2, cluster_by=["col"]
    )
    # redelivery of batch 1 after compaction: still a no-op
    v = snapshot_versions(spark, f"{store}/values")[-1]
    profile_ingest_batch(
        spark.createDataFrame(B1, _SCHEMA), 1, store, _COLS
    )
    assert snapshot_versions(spark, f"{store}/values")[-1] == v
    # and batch 2 folds correctly on the compacted state
    got = profile_ingest_batch(
        spark.createDataFrame(B2, _SCHEMA), 2, store, _COLS
    )
    assert _norm(got) == _norm(_batch_profile(spark, B0 + B1 + B2))


def test_multiplicity_delta_contract(spark):
    """Unit contract of streaming/util.py::multiplicity_delta (the
    machinery quality/profile now share): _old is the stored
    multiplicity for touched keys, 0 for unseen keys; untouched stored
    keys never appear; the bootstrap (pre=None) zeroes everything; the
    merged rows are _old + _d."""
    import pyspark.sql.functions as F

    from ros_sql_spark.streaming.util import (
        merged_multiplicities,
        multiplicity_delta,
    )

    pre = spark.createDataFrame(
        [("a", 2), ("b", 1), ("z", 9)], "k string, n bigint"
    )
    keyed = spark.createDataFrame(
        [("a", 3), ("c", 1)], "k string, _d bigint"
    )
    j = {r["k"]: (r["_d"], r["_old"])
         for r in multiplicity_delta(pre, keyed, ["k"]).collect()}
    assert j == {"a": (3, 2), "c": (1, 0)}  # z untouched, absent
    m = {r["k"]: r["n"]
         for r in merged_multiplicities(
             multiplicity_delta(pre, keyed, ["k"]), ["k"]).collect()}
    assert m == {"a": 5, "c": 1}
    b = {r["k"]: (r["_d"], r["_old"])
         for r in multiplicity_delta(None, keyed, ["k"]).collect()}
    assert b == {"a": (3, 0), "c": (1, 0)}
