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


# ---------------------------------------------------------------- quantiles
_QSCHEMA = "uid bigint, qty double, score bigint, flag string"
_QCOLS = {"qty": True, "score": True, "flag": False}

Q0 = [(i, float(i % 7) + 0.5, i * 3, "AB"[i % 2]) for i in range(10)]
Q1 = [(100 + i, float(i) * 2.25, None if i == 3 else i - 4, "C")
      for i in range(8)]
Q2 = [(200 + i, None if i % 4 == 0 else -float(i), i * i, "A")
      for i in range(12)]


def _scratch_sketch(spark, rows, k):
    """From-scratch reference: quantile_sketch over the UNION of every
    ingested row, melted exactly like the monitor melts."""
    import pyspark.sql.functions as F  # noqa: F401

    from ros_sql_spark.operators.sketch import quantile_sketch

    df = spark.createDataFrame(rows, _QSCHEMA)
    nums = [c for c, n in _QCOLS.items() if n]
    stack = ", ".join(f"'{c}', CAST(`{c}` AS DOUBLE)" for c in nums)
    melted = df.selectExpr(
        "uid AS _qk", f"stack({len(nums)}, {stack}) AS (col, qv)"
    )
    return quantile_sketch(melted, "col", "qv", "_qk", k=k)


def _sample_of(sketch_df):
    out: dict = {}
    for r in sketch_df.collect():
        out.setdefault(r["col"], []).append((int(r["h"]), float(r["v"])))
    return {c: sorted(v) for c, v in out.items()}


@pytest.mark.slow  # snapshot commits per batch (quality-twin class)
def test_profile_quantile_sample_equals_scratch_at_every_boundary(
    spark, tmp_path
):
    """Round-14 directive #6: the running bottom-k sample == the
    from-scratch batch sketch over everything ingested, at EVERY batch
    boundary (merge associativity made observable), and the
    driver-side estimates == quantile_estimate over that sketch,
    double-for-double.  k=8 < rows so real eviction happens; NULL
    values excluded; the string column carries no sample."""
    from ros_sql_spark.operators.sketch import quantile_estimate
    from ros_sql_spark.streaming.profile import profile_quantiles_read

    store = str(tmp_path / "p")
    k = 8
    seen = []
    for b, rows in enumerate((Q0, Q1, Q2)):
        seen += rows
        got = profile_ingest_batch(
            spark.createDataFrame(rows, _QSCHEMA), b, store, _QCOLS,
            quantile_key="uid", quantile_k=k,
        )
        want = _sample_of(_scratch_sketch(spark, seen, k))
        for c in ("qty", "score"):
            assert [tuple(x) for x in got[c]["qsample"]] == want[c], (
                b, c,
            )
        assert "qsample" not in got.get("flag", {})
    ps = {"p25": 0.25, "p50": 0.5, "p75": 0.75}
    want_est = {
        r["col"]: r
        for r in quantile_estimate(
            _scratch_sketch(spark, seen, k), "col", ps
        ).collect()
    }
    rep = {
        r["column"]: r
        for r in profile_quantiles_read(spark, store, ps).collect()
    }
    assert set(rep) == {"qty", "score"}
    for c in rep:
        assert rep[c]["n_sample"] == want_est[c]["n_sample"]
        for name in ps:
            assert rep[c][name] == want_est[c][name], (c, name)


def test_profile_quantile_crash_and_redelivery(spark, tmp_path, monkeypatch):
    """The sample rides the SAME atomic commit as the counters: a crash
    in the commit leaves the pre-batch sample; the replay lands the
    exact un-crashed sample; a redelivered batch is a no-op on it."""
    import ros_sql_spark.streaming.profile as pr

    store = str(tmp_path / "p")
    k = 8
    profile_ingest_batch(
        spark.createDataFrame(Q0, _QSCHEMA), 0, store, _QCOLS,
        quantile_key="uid", quantile_k=k,
    )
    real = pr.snapshot_merge
    state = {"crashed": False}

    def crashing(*a, **kw):
        if not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("injected crash")
        return real(*a, **kw)

    monkeypatch.setattr(pr, "snapshot_merge", crashing)
    with pytest.raises(RuntimeError):
        profile_ingest_batch(
            spark.createDataFrame(Q1, _QSCHEMA), 1, store, _QCOLS,
            quantile_key="uid", quantile_k=k,
        )
    monkeypatch.setattr(pr, "snapshot_merge", real)
    got = profile_ingest_batch(
        spark.createDataFrame(Q1, _QSCHEMA), 1, store, _QCOLS,
        quantile_key="uid", quantile_k=k,
    )
    want = _sample_of(_scratch_sketch(spark, Q0 + Q1, k))
    assert [tuple(x) for x in got["qty"]["qsample"]] == want["qty"]
    # redelivery: no-op, sample unchanged
    again = profile_ingest_batch(
        spark.createDataFrame(Q1, _QSCHEMA), 1, store, _QCOLS,
        quantile_key="uid", quantile_k=k,
    )
    assert again["qty"]["qsample"] == got["qty"]["qsample"]
    # a different k against existing state is a named error
    with pytest.raises(ValueError, match="quantile_k"):
        profile_ingest_batch(
            spark.createDataFrame(Q2, _QSCHEMA), 2, store, _QCOLS,
            quantile_key="uid", quantile_k=16,
        )


def test_profile_rejects_hostile_column_names(spark, tmp_path):
    """Round-13 ADVICE: names are interpolated into selectExpr — a
    backtick/quote would break the parse or silently corrupt the state
    key.  Named error at entry instead."""
    df = spark.createDataFrame([(1,)], "ok bigint")
    for bad in ("a`b", "a'b", "a b", "1a", "a;drop"):
        with pytest.raises(ValueError, match="identifier"):
            profile_ingest_batch(
                df, 0, str(tmp_path / "p"), {bad: True}
            )
    with pytest.raises(ValueError, match="identifier"):
        profile_ingest_batch(
            df, 0, str(tmp_path / "p"), {"ok": True},
            quantile_key="u`id",
        )


def test_multiplicity_delta_large_batch_fallback(spark):
    """Round-13 ADVICE: above broadcast_max_keys touched keys the probe
    must fall back to the un-hinted semi-join (a bootstrap batch can
    exceed the broadcast limit) — same results either way."""
    from ros_sql_spark.streaming.util import multiplicity_delta

    pre = spark.createDataFrame(
        [("a", 2), ("b", 1), ("z", 9)], "k string, n bigint"
    )
    keyed = spark.createDataFrame(
        [("a", 3), ("c", 1)], "k string, _d bigint"
    )
    want = {("a", 3, 2), ("c", 1, 0)}
    for thresh in (1, 2):  # both below the 2-key batch → fallback path
        got = {
            (r["k"], r["_d"], r["_old"])
            for r in multiplicity_delta(
                pre, keyed, ["k"], broadcast_max_keys=thresh
            ).collect()
        }
        assert got == want, thresh


def test_profile_quantiles_cannot_enable_mid_stream(spark, tmp_path):
    """Round-14 self-review: enabling quantile_key on a store that
    already ingested batches without it would produce a sample over a
    SUFFIX of the corpus while the contract promises from-scratch
    equality — a named error instead."""
    store = str(tmp_path / "p")
    profile_ingest_batch(
        spark.createDataFrame(Q0, _QSCHEMA), 0, store, _QCOLS
    )
    with pytest.raises(ValueError, match="retroactively"):
        profile_ingest_batch(
            spark.createDataFrame(Q1, _QSCHEMA), 1, store, _QCOLS,
            quantile_key="uid",
        )


def test_profile_quantiles_cannot_disable_mid_stream(spark, tmp_path):
    """Round-15 ADVICE (mirror of the enable guard): ingesting WITHOUT
    quantile_key into a store that previously sampled would carry each
    column's stale qsample forward while dropping _quantile_k — reads
    would silently miss the new batch.  A named error instead."""
    store = str(tmp_path / "p")
    profile_ingest_batch(
        spark.createDataFrame(Q0, _QSCHEMA), 0, store, _QCOLS,
        quantile_key="uid",
    )
    with pytest.raises(ValueError, match="keep passing"):
        profile_ingest_batch(
            spark.createDataFrame(Q1, _QSCHEMA), 1, store, _QCOLS
        )


def test_multiplicity_delta_byte_gate_and_caller_count(spark):
    """Round-15: (a) the gating job also bounds estimated key BYTES —
    few rows of very wide keys must take the fallback path (r14 ADVICE:
    the row gate alone allowed multi-hundred-MB broadcasts); (b) a
    caller-supplied keyed_count upper bound skips the gating job and
    picks the path by rows alone — same results on every path."""
    from ros_sql_spark.streaming.util import multiplicity_delta

    pre = spark.createDataFrame(
        [("a" * 100, 2), ("b", 1)], "k string, n bigint"
    )
    keyed = spark.createDataFrame(
        [("a" * 100, 3), ("c" * 100, 1)], "k string, _d bigint"
    )
    want = {("a" * 100, 3, 2), ("c" * 100, 1, 0)}

    def run(**kw):
        return {
            (r["k"], r["_d"], r["_old"])
            for r in multiplicity_delta(pre, keyed, ["k"], **kw).collect()
        }

    # byte gate: 200 key bytes > 50-byte budget → fallback; same rows
    assert run(broadcast_max_bytes=50) == want
    # generous budgets → broadcast path; same rows
    assert run() == want
    # caller-supplied bound: small → broadcast, large → fallback
    assert run(keyed_count=2) == want
    assert run(keyed_count=10_000_000) == want


def test_profile_quantiles_backfill_equals_from_scratch(spark, tmp_path):
    """Round-15 directive #7: backfill on a store that ingested WITHOUT
    quantiles makes it indistinguishable from one that sampled from
    birth — the committed sample equals the from-scratch sketch, the
    NEXT quantile-enabled batch continues the merge exactly, and the
    batch watermark survives the meta-only commit (redelivery still
    no-ops)."""
    from ros_sql_spark.streaming.profile import profile_quantiles_backfill

    store = str(tmp_path / "p")
    k = 8
    profile_ingest_batch(spark.createDataFrame(Q0, _QSCHEMA), 0, store, _QCOLS)
    profile_ingest_batch(spark.createDataFrame(Q1, _QSCHEMA), 1, store, _QCOLS)

    corpus = spark.createDataFrame(Q0 + Q1, _QSCHEMA)
    prof = profile_quantiles_backfill(corpus, store, _QCOLS, "uid", quantile_k=k)
    want = _sample_of(_scratch_sketch(spark, Q0 + Q1, k))
    for c in ("qty", "score"):
        assert [tuple(x) for x in prof[c]["qsample"]] == want[c], c

    # the next batch continues the running merge exactly
    got = profile_ingest_batch(
        spark.createDataFrame(Q2, _QSCHEMA), 2, store, _QCOLS,
        quantile_key="uid", quantile_k=k,
    )
    want2 = _sample_of(_scratch_sketch(spark, Q0 + Q1 + Q2, k))
    for c in ("qty", "score"):
        assert [tuple(x) for x in got[c]["qsample"]] == want2[c], c
    # watermark intact: batch 2 redelivery no-ops
    again = profile_ingest_batch(
        spark.createDataFrame(Q2, _QSCHEMA), 2, store, _QCOLS,
        quantile_key="uid", quantile_k=k,
    )
    assert again["qty"]["qsample"] == got["qty"]["qsample"]
    # disable guard now applies
    with pytest.raises(ValueError, match="keep passing"):
        profile_ingest_batch(
            spark.createDataFrame(Q0, _QSCHEMA), 3, store, _QCOLS
        )


def test_profile_quantiles_backfill_guards(spark, tmp_path, monkeypatch):
    """Backfill refuses: a mismatched corpus (rows or per-column null
    counts), an already-enabled store, an empty store; and a crash in
    the meta commit leaves the store un-backfilled (retry succeeds)."""
    import ros_sql_spark.streaming.profile as pr
    from ros_sql_spark.streaming.profile import profile_quantiles_backfill

    store = str(tmp_path / "p")
    with pytest.raises(ValueError, match="no profile state"):
        profile_quantiles_backfill(
            spark.createDataFrame(Q0, _QSCHEMA), store, _QCOLS, "uid")
    profile_ingest_batch(spark.createDataFrame(Q0, _QSCHEMA), 0, store, _QCOLS)
    profile_ingest_batch(spark.createDataFrame(Q1, _QSCHEMA), 1, store, _QCOLS)

    # wrong corpus: row count off
    with pytest.raises(ValueError, match="rows but the store"):
        profile_quantiles_backfill(
            spark.createDataFrame(Q0, _QSCHEMA), store, _QCOLS, "uid")
    # wrong corpus: right row count, wrong null profile (swap a null in)
    bad = Q0 + [(r[0], None, r[2], r[3]) for r in Q1]
    with pytest.raises(ValueError, match="null count"):
        profile_quantiles_backfill(
            spark.createDataFrame(bad, _QSCHEMA), store, _QCOLS, "uid")

    # crash in the commit: store stays un-backfilled, retry lands
    corpus = spark.createDataFrame(Q0 + Q1, _QSCHEMA)
    real = pr.snapshot_commit if hasattr(pr, "snapshot_commit") else None
    import ros_sql_spark.sources.snapshot as sn
    real_publish = sn._publish_manifest
    state = {"crashed": False}

    def crashing(*a, **kw):
        if not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("injected crash")
        return real_publish(*a, **kw)

    monkeypatch.setattr(sn, "_publish_manifest", crashing)
    with pytest.raises(RuntimeError, match="injected"):
        profile_quantiles_backfill(corpus, store, _QCOLS, "uid", quantile_k=8)
    monkeypatch.setattr(sn, "_publish_manifest", real_publish)
    prof = profile_quantiles_backfill(corpus, store, _QCOLS, "uid", quantile_k=8)
    assert prof.get("_quantile_k") == 8
    # second backfill: already enabled
    with pytest.raises(ValueError, match="already enabled"):
        profile_quantiles_backfill(corpus, store, _QCOLS, "uid", quantile_k=8)
