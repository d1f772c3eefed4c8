"""Streaming curate(): drained-stream == batch curate() under the
equivalence regime, per-batch ledger reconciliation, redelivery
idempotence, crash recovery at the docs->ledger seam.

The equivalence regime (streaming/curate.py docstring): quality is
per-doc (always equal); boilerplate/span statistics are batch-local,
so the corpus is constructed with chrome repeating ABOVE threshold
within every batch (the production regime); dedup families are
cliques arriving in ascending-id batches, members length-matched, so
first-come == min-id == batch keep-best.
"""

from __future__ import annotations

import pytest

# streaming curation equivalence suite: slow tier by module (r11 duration profile)
pytestmark = pytest.mark.slow

import pyspark.sql.functions as F

from ros_sql_spark.pipeline import curate
from ros_sql_spark.streaming.curate import (
    curate_corpus_read,
    curate_ingest_batch,
    curate_ingest_stream,
    curate_ledger_read,
)

HEADER = "the site header menu login subscribe now please read today"
SPAN = "alpha beta gamma delta epsilon zeta"


def _body(i: int, n: int = 20) -> str:
    return " ".join("the" if j % 7 == 0 else f"w{i}x{j}" for j in range(n))


def _family_text(prefix: str | None = None) -> str:
    """Near-dup family around a 30-token canonical.  A near copy gets a
    unique PREFIX and loses a few tail tokens: 5-gram shingles are
    shift-invariant (Jaccard ~0.8 vs canonical) but the 10-token
    boilerplate PASSAGE blocks all shift, so no passage repeats across
    family variants (passage df stays <= max_df=2 — only the one exact
    pair shares blocks) and the family is invisible to the chrome
    stage in both pipelines.  Copies are strictly shorter than the
    canonical, so batch keep-best (longest) == streaming first-come
    (min id)."""
    toks = ["the" if j % 7 == 0 else f"fa{j}" for j in range(30)]
    if prefix is None:
        return " ".join(toks)
    p = prefix.split(" ")
    return " ".join(p + toks[: 30 - len(p) - 2])


def _mk_batch(base: int, first: bool) -> list[tuple[int, str]]:
    rows: list[tuple[int, str]] = []
    # 6 docs with a shared 10-token header passage (df=6 > max_df=2
    # batch-locally AND corpus-wide: the equivalence regime)
    for i in range(6):
        rows.append((base + i, HEADER + " " + _body(base + i)))
    # 1 all-header doc: dropped entirely at the boilerplate stage
    rows.append((base + 6, HEADER))
    # 6 docs embedding the duplicated 6-token span at varying offsets
    # (span_min_docs=6 keeps the span stage blind to the ≤3-copy
    # near-dup family below, in BOTH pipelines — the two dedup layers
    # must not compete for the same windows)
    for i in range(6):
        pre = " ".join(f"p{base + i}q{j}" for j in range(6 + i)) + " the"
        post = "the " + " ".join(f"s{base + i}t{j}" for j in range(8))
        rows.append((base + 7 + i, pre + " " + SPAN + " " + post))
    # 1 pure-span doc: every token covered -> dropped at the span stage
    rows.append((base + 14, SPAN))
    # 3 quality drops: too short / punctuation-heavy / no stopwords
    rows.append((base + 15, "short text here"))
    rows.append((base + 16, "the " + " ".join(["!!!"] * 15)))
    rows.append((base + 17, " ".join(f"q{base}z{j}" for j in range(20))))
    # near-dup family: canonical + copies in batch 1, late copies of
    # the SAME canonical in batch 2 (ascending ids -> first-come wins
    # == min id == batch keep-best: the canonical is strictly longest)
    if first:
        rows.append((base + 20, _family_text()))
        rows.append((base + 21, _family_text()))            # exact copy
        rows.append((base + 22, _family_text("zz1")))       # near copy
    else:
        rows.append((base + 20, _family_text("yy1 yy2")))   # near copy
        rows.append((base + 21, _family_text("yy1 yy2")))   # its exact twin
    # plain unique survivors
    for i in range(5):
        rows.append((base + 30 + i, _body(base + 30 + i, 24)))
    return rows


_POLICY = dict(
    boilerplate_max_df=2,
    span_dedup_k=6,
    span_min_docs=6,
)


def _batch_curate(spark, docs, eval_docs=None):
    return curate(
        docs,
        near_dup_threshold=0.5,
        near_dup_method="setsim",
        shingle_k=5,
        boilerplate_passage_tokens=10,
        eval_docs=eval_docs,
        **_POLICY,
    )


def test_streaming_curate_equals_batch_and_ledger_reconciles(
    spark, tmp_path
):
    rows1 = _mk_batch(0, first=True)
    rows2 = _mk_batch(100, first=False)
    docs = spark.createDataFrame(rows1 + rows2, "doc_id bigint, text string")
    # decontamination targets: one CLUSTER-FREE plain doc per batch (a
    # 6-token cut of its body shares 5-shingles with nothing else), so
    # batch-order (decontam after near-dup) == stream-order (before
    # dedup) — the documented agreement regime
    evald = spark.createDataFrame(
        [
            (900, " ".join(_body(30, 24).split(" ")[2:8])),
            (901, " ".join(_body(130, 24).split(" ")[2:8])),
        ],
        "doc_id bigint, text string",
    )

    res = _batch_curate(spark, docs, eval_docs=evald)
    batch_kept = {
        (r.doc_id, r.text)
        for r in res.docs.select("doc_id", "text").collect()
    }
    m = res.metrics()

    # drive the REAL stream: one file per micro-batch, ascending ids
    src = str(tmp_path / "src")
    spark.createDataFrame(rows1, docs.schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(rows2, docs.schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    store = str(tmp_path / "store")
    q = curate_ingest_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src),
        store,
        checkpoint_path=str(tmp_path / "ck1"),
        threshold=0.5,
        k=5,
        eval_docs=evald,
        **_POLICY,
    )
    q.awaitTermination(240)
    assert not q.isActive

    stream_kept = {
        (r.doc_id, r.text)
        for r in curate_corpus_read(spark, store).collect()
    }
    assert stream_kept == batch_kept

    # ledger: one row per batch, per-row identity, totals reconcile
    # against the input, the corpus AND the batch pipeline's metrics
    led = sorted(
        curate_ledger_read(spark, store).collect(),
        key=lambda r: r.batch_id,
    )
    assert [r.batch_id for r in led] == [0, 1]
    for r in led:
        assert r.n_batch == (
            r.n_boilerplate + r.n_span + r.n_quality + r.n_decontam
            + r.n_semantic + r.n_dedup + r.n_kept
        ), r
    tot = {
        f: sum(getattr(r, f) for r in led)
        for f in (
            "n_batch", "n_boilerplate", "n_span",
            "n_quality", "n_decontam", "n_semantic", "n_dedup", "n_kept",
        )
    }
    assert tot["n_batch"] == len(rows1) + len(rows2)
    assert tot["n_kept"] == len(stream_kept)
    assert tot["n_boilerplate"] == m["boilerplate"]
    assert tot["n_span"] == m["span_dedup"]
    assert tot["n_quality"] == m["quality"]
    assert tot["n_decontam"] == m["decontam"]
    # batch splits dedup into exact (md5) + near_dup; streaming's
    # setsim subsumes exact at Jaccard 1.0 -> one combined count
    assert tot["n_dedup"] == m["exact"] + m["near_dup"]
    # every stage actually engaged (the corpus was built to exercise
    # each one — a zero here means the stage silently stopped firing)
    assert min(
        tot["n_boilerplate"], tot["n_span"], tot["n_quality"],
        tot["n_decontam"], tot["n_dedup"],
    ) > 0

    # full redelivery from a fresh checkpoint: every table version
    # (ledger included) untouched
    from ros_sql_spark.sources.snapshot import snapshot_versions

    tables = ("docs", "sets", "prefix", "freq", "labels", "ledger")
    versions = {
        n: snapshot_versions(spark, f"{store}/{n}")[-1] for n in tables
    }
    q2 = curate_ingest_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src),
        store,
        checkpoint_path=str(tmp_path / "ck2"),
        threshold=0.5,
        k=5,
        eval_docs=evald,
        **_POLICY,
    )
    q2.awaitTermination(240)
    for n, v in versions.items():
        assert snapshot_versions(spark, f"{store}/{n}")[-1] == v, n
    assert {
        (r.doc_id, r.text)
        for r in curate_corpus_read(spark, store).collect()
    } == batch_kept


def test_streaming_curate_crash_between_docs_and_ledger(
    spark, tmp_path, monkeypatch
):
    """Crash AFTER the dedup tables committed, BEFORE the ledger row:
    the replay must recompute the stage counts deterministically, take
    the setsim early-exit (docs-growth accounting), and land exactly
    ONE ledger row with the same counts the un-crashed run would
    have."""
    import ros_sql_spark.streaming.curate as sc

    rows = _mk_batch(0, first=True)
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    store = str(tmp_path / "store")

    real_commit = sc.snapshot_commit
    state = {"crashed": False}

    def crashing(df, table, **kw):
        if table.endswith("/ledger") and not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("injected crash before ledger commit")
        return real_commit(df, table, **kw)

    monkeypatch.setattr(sc, "snapshot_commit", crashing)
    try:
        curate_ingest_batch(docs, 0, store, threshold=0.5, k=5, **_POLICY)
        raise AssertionError("injected crash did not fire")
    except RuntimeError:
        pass
    # dedup tables landed, ledger absent
    from ros_sql_spark.sources.snapshot import snapshot_versions

    assert snapshot_versions(spark, f"{store}/docs")
    import pytest

    with pytest.raises(Exception):
        curate_ledger_read(spark, store).collect()

    # replay (redelivery of the same batch)
    row = curate_ingest_batch(docs, 0, store, threshold=0.5, k=5, **_POLICY)
    led = curate_ledger_read(spark, store).collect()
    assert len(led) == 1
    r = led[0]
    assert {
        "batch_id": r.batch_id,
        "n_batch": r.n_batch,
        "n_boilerplate": r.n_boilerplate,
        "n_span": r.n_span,
        "n_quality": r.n_quality,
        "n_decontam": r.n_decontam,
        "n_semantic": r.n_semantic,
        "n_dedup": r.n_dedup,
        "n_kept": r.n_kept,
    } == row
    assert r.n_batch == (
        r.n_boilerplate + r.n_span + r.n_quality + r.n_decontam
        + r.n_semantic + r.n_dedup + r.n_kept
    )
    assert r.n_kept == curate_corpus_read(spark, store).count()

    # a SECOND replay is a full no-op: every version pinned
    versions = {
        n: snapshot_versions(spark, f"{store}/{n}")[-1]
        for n in ("docs", "sets", "prefix", "freq", "labels", "ledger")
    }
    curate_ingest_batch(docs, 0, store, threshold=0.5, k=5, **_POLICY)
    for n, v in versions.items():
        assert snapshot_versions(spark, f"{store}/{n}")[-1] == v, n


def test_streaming_curate_all_dropped_batch_advances_watermark(
    spark, tmp_path
):
    """A batch the quality gate fully rejects still advances every
    watermark (else redelivery would re-run it forever) and lands a
    ledger row with n_kept=0."""
    rows = [(1, "short one"), (2, "tiny doc")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    store = str(tmp_path / "store")
    row = curate_ingest_batch(docs, 7, store, threshold=0.5, k=5)
    assert row == {
        "batch_id": 7,
        "n_batch": 2,
        "n_boilerplate": 0,
        "n_span": 0,
        "n_quality": 2,
        "n_decontam": 0,
        "n_semantic": 0,
        "n_dedup": 0,
        "n_kept": 0,
    }
    assert curate_corpus_read(spark, store).count() == 0
    # replay skips everything (the watermark advanced on empty appends)
    from ros_sql_spark.sources.snapshot import snapshot_versions

    versions = {
        n: snapshot_versions(spark, f"{store}/{n}")[-1]
        for n in ("docs", "ledger")
    }
    row2 = curate_ingest_batch(docs, 7, store, threshold=0.5, k=5)
    assert row2["n_kept"] == 0 and row2["n_batch"] == 2
    for n, v in versions.items():
        assert snapshot_versions(spark, f"{store}/{n}")[-1] == v, n
    # and a following batch ingests normally on top
    nxt = spark.createDataFrame(
        [(3, _body(3, 24))], "doc_id bigint, text string"
    )
    row3 = curate_ingest_batch(nxt, 8, store, threshold=0.5, k=5)
    assert row3["n_kept"] == 1
    assert curate_corpus_read(spark, store).count() == 1


def test_streaming_curate_semantic_stage_equals_batch(spark, tmp_path):
    """The semantic (embedding-cosine) stage through the streaming
    ingest: cross-batch vector state (vecs/vbuckets), first-come-wins
    against the published corpus, min-id per purely-new cluster —
    equal to batch curate()'s semantic stage in the clique/equal-length
    regime (same argument as the text dedup), ledger n_semantic
    reconciling against batch metrics, state tables holding exactly
    the published docs' vectors, and redelivery a version no-op."""
    from ros_sql_spark.sources.snapshot import snapshot_read, snapshot_versions

    def sbody(i: int, n: int = 24) -> str:
        # fixed-width unique vocab: every doc's text has the SAME char
        # length, so batch keep-best (longest-then-min-id) == streaming
        # first-come (min id) for the vector families
        return " ".join(
            "the" if j % 7 == 0 else f"s{i:04d}x{j}" for j in range(n)
        )

    rows1 = [(i, sbody(i)) for i in (1, 2, 3, 4)]
    rows2 = [(i, sbody(i)) for i in (101, 102, 103)]
    docs = spark.createDataFrame(rows1 + rows2, "doc_id bigint, text string")
    vA = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    vB = [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    vC = [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    emb = spark.createDataFrame(
        # family A = {2, 4, 102} (identical vectors, cos 1.0); B/C
        # orthogonal singletons; docs 1/101 carry no vector at all
        [(2, vA), (4, vA), (102, vA), (3, vB), (103, vC)],
        "vec_id bigint, embedding array<float>",
    )

    res = curate(
        docs,
        near_dup_threshold=0.5,
        near_dup_method="setsim",
        shingle_k=5,
        embeddings=emb,
        embedding_dim=8,
        cosine_threshold=0.9,
    )
    batch_kept = {
        (r.doc_id, r.text)
        for r in res.docs.select("doc_id", "text").collect()
    }
    m = res.metrics()
    assert m["semantic_dup"] == 2  # 4 (batch-mate) and 102 (late copy)

    store = str(tmp_path / "store")
    kw = dict(threshold=0.5, k=5, embeddings=emb,
              embedding_dim=8, cosine_threshold=0.9)
    r0 = curate_ingest_batch(
        spark.createDataFrame(rows1, docs.schema), 0, store, **kw
    )
    r1 = curate_ingest_batch(
        spark.createDataFrame(rows2, docs.schema), 1, store, **kw
    )
    assert r0["n_semantic"] == 1 and r1["n_semantic"] == 1
    stream_kept = {
        (r.doc_id, r.text)
        for r in curate_corpus_read(spark, store).collect()
    }
    assert stream_kept == batch_kept

    # state tables hold exactly the PUBLISHED docs' vectors: {2, 3, 103}
    vec_ids = {
        r.doc_id for r in snapshot_read(spark, f"{store}/vecs").collect()
    }
    assert vec_ids == {2, 3, 103}
    vb = snapshot_read(spark, f"{store}/vbuckets")
    assert {r.doc_id for r in vb.select("doc_id").collect()} == {2, 3, 103}
    assert vb.count() == 3 * 16  # one row per (id, band)

    # redelivery of batch 1: every table (vector state included) pinned
    tables = ("docs", "sets", "prefix", "freq", "labels",
              "vecs", "vbuckets", "ledger")
    versions = {
        n: snapshot_versions(spark, f"{store}/{n}")[-1] for n in tables
    }
    r1b = curate_ingest_batch(
        spark.createDataFrame(rows2, docs.schema), 1, store, **kw
    )
    assert r1b["n_kept"] == r1["n_kept"]
    for n, v in versions.items():
        assert snapshot_versions(spark, f"{store}/{n}")[-1] == v, n


def test_streaming_curate_store_maintenance_window(spark, tmp_path):
    """The operational loop for a long-running curate store: after N
    batches the per-batch version stack is compacted (one commit per
    table) and vacuumed to the head — the maintenance a 100 TB stream
    runs periodically so version listings and small-file counts stay
    bounded.  Must hold afterwards: the batch watermark carried through
    the compaction (a replay of the LAST pre-maintenance batch is a
    full no-op, never a re-ingest), the corpus/ledger/vector state are
    byte-identical, and the NEXT batch ingests normally against the
    compacted probe state."""
    from ros_sql_spark.sources.snapshot import (
        snapshot_compact,
        snapshot_read,
        snapshot_vacuum,
        snapshot_versions,
    )

    vA = [1.0, 0.0, 0.0, 0.0]
    emb = spark.createDataFrame(
        [(2, vA), (202, vA)], "vec_id bigint, embedding array<float>"
    )
    kw = dict(threshold=0.5, k=5, embeddings=emb,
              embedding_dim=4, cosine_threshold=0.9)
    store = str(tmp_path / "store")

    def batch(ids):
        return spark.createDataFrame(
            [(i, _body(i, 24)) for i in ids], "doc_id bigint, text string"
        )

    curate_ingest_batch(batch([1, 2, 3]), 0, store, **kw)
    row1 = curate_ingest_batch(batch([101, 102]), 1, store, **kw)

    tables = ("docs", "sets", "prefix", "freq", "labels",
              "vecs", "vbuckets", "ledger")
    before = {
        n: sorted(
            tuple(r) for r in snapshot_read(spark, f"{store}/{n}").collect()
        )
        for n in tables
    }

    # the maintenance window: compact every table to one file, vacuum
    # everything but the head
    for n in tables:
        snapshot_compact(spark, f"{store}/{n}", target_files=1)
        snapshot_vacuum(spark, f"{store}/{n}", keep_last=1)
        assert len(snapshot_versions(spark, f"{store}/{n}")) == 1, n

    after = {
        n: sorted(
            tuple(r) for r in snapshot_read(spark, f"{store}/{n}").collect()
        )
        for n in tables
    }
    assert after == before

    # replay of the last pre-maintenance batch: the carried watermark
    # makes every commit skip (versions pinned at 1 everywhere), and
    # the returned row is the COMMITTED ledger row verbatim — NOT a
    # recompute against the vacuumed (now-empty) pre-batch state,
    # which would have reported n_kept = the whole corpus
    r1 = curate_ingest_batch(batch([101, 102]), 1, store, **kw)
    assert r1 == row1
    for n in tables:
        assert len(snapshot_versions(spark, f"{store}/{n}")) == 1, n

    # the next batch ingests normally against the compacted state:
    # 201 is a fresh doc; 202 near-dups nothing textually but its
    # vector clusters with published doc 2 -> semantic drop
    r2 = curate_ingest_batch(batch([201, 202]), 2, store, **kw)
    assert r2["n_semantic"] == 1 and r2["n_kept"] == 1
    kept = {r.doc_id for r in curate_corpus_read(spark, store).collect()}
    assert kept == {1, 2, 3, 101, 102, 201}


def test_streaming_curate_crash_then_vacuum_replay_accounting(
    spark, tmp_path, monkeypatch
):
    """Round-9 ADVICE hole: crash AFTER the dedup/vector tables
    committed, BEFORE the ledger row, then a maintenance vacuum
    (keep_last=1) reclaims every pre-batch version.  The replay can no
    longer recompute against pre-batch state — the per-batch counts
    persisted in the docs manifest's ``acct`` meta must land the SAME
    ledger row an un-crashed run produces.  Previously the setsim
    fast path read pre_docs=0 and committed n_kept = the whole corpus
    permanently (and the semantic drop was misattributed to dedup)."""
    import ros_sql_spark.streaming.curate as sc
    from ros_sql_spark.sources.snapshot import (
        snapshot_compact,
        snapshot_vacuum,
        snapshot_versions,
    )

    vA = [1.0, 0.0, 0.0, 0.0]
    emb = spark.createDataFrame(
        [(2, vA), (202, vA)], "vec_id bigint, embedding array<float>"
    )
    kw = dict(threshold=0.5, k=5, embeddings=emb,
              embedding_dim=4, cosine_threshold=0.9)

    def batch(ids):
        return spark.createDataFrame(
            [(i, _body(i, 24)) for i in ids], "doc_id bigint, text string"
        )

    # reference run (no crash, no vacuum): the row batch 1 SHOULD get
    # — 202's vector clusters with published doc 2 -> semantic drop
    ref = str(tmp_path / "ref")
    curate_ingest_batch(batch([1, 2, 3]), 0, ref, **kw)
    want = curate_ingest_batch(batch([201, 202]), 1, ref, **kw)
    assert want["n_semantic"] == 1 and want["n_kept"] == 1

    store = str(tmp_path / "store")
    curate_ingest_batch(batch([1, 2, 3]), 0, store, **kw)

    real_commit = sc.snapshot_commit
    state = {"crashed": False}

    def crashing(df, table, **kws):
        if table.endswith("/ledger") and not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("injected crash before ledger commit")
        return real_commit(df, table, **kws)

    monkeypatch.setattr(sc, "snapshot_commit", crashing)
    import pytest

    with pytest.raises(RuntimeError, match="injected"):
        curate_ingest_batch(batch([201, 202]), 1, store, **kw)
    monkeypatch.setattr(sc, "snapshot_commit", real_commit)

    # the maintenance window fires before the replay: every pre-batch
    # version is gone
    tables = ("docs", "sets", "prefix", "freq", "labels",
              "vecs", "vbuckets", "ledger")
    for n in tables:
        snapshot_compact(spark, f"{store}/{n}", target_files=1)
        snapshot_vacuum(spark, f"{store}/{n}", keep_last=1)
        assert len(snapshot_versions(spark, f"{store}/{n}")) == 1, n

    row = curate_ingest_batch(batch([201, 202]), 1, store, **kw)
    assert row == want
    led = {r.batch_id: r for r in curate_ledger_read(spark, store).collect()}
    assert len(led) == 2
    r1 = led[1]
    assert r1.n_kept == want["n_kept"]
    assert r1.n_semantic == want["n_semantic"]
    assert r1.n_dedup == want["n_dedup"]
    # the global invariant the old code broke: sum(n_kept) == corpus
    total_kept = sum(r.n_kept for r in led.values())
    assert total_kept == curate_corpus_read(spark, store).count()


def test_streaming_curate_vacuum_replay_without_acct_meta_raises(
    spark, tmp_path, monkeypatch
):
    """A store whose docs head manifest cannot vouch for the replayed
    batch (acct meta stripped — the pre-round-10 on-disk format) and
    whose pre-batch versions were vacuumed must RAISE on replay, never
    silently commit a mis-accounted ledger row."""
    import ros_sql_spark.streaming.curate as sc
    import ros_sql_spark.streaming.dedup as sd
    from ros_sql_spark.sources.snapshot import (
        snapshot_compact,
        snapshot_vacuum,
    )

    def batch(ids):
        return spark.createDataFrame(
            [(i, _body(i, 24)) for i in ids], "doc_id bigint, text string"
        )

    store = str(tmp_path / "store")
    curate_ingest_batch(batch([1, 2, 3]), 0, store)

    real_sd = sd.snapshot_commit
    real_sc = sc.snapshot_commit
    state = {"crashed": False}

    def stripping(df, table, **kws):
        if table.endswith("/docs"):
            kws.pop("meta", None)  # simulate the legacy writer
        return real_sd(df, table, **kws)

    def crashing(df, table, **kws):
        if table.endswith("/ledger") and not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("injected crash before ledger commit")
        return real_sc(df, table, **kws)

    monkeypatch.setattr(sd, "snapshot_commit", stripping)
    monkeypatch.setattr(sc, "snapshot_commit", crashing)
    import pytest

    with pytest.raises(RuntimeError, match="injected"):
        curate_ingest_batch(batch([201, 202]), 1, store)
    monkeypatch.setattr(sd, "snapshot_commit", real_sd)
    monkeypatch.setattr(sc, "snapshot_commit", real_sc)

    for n in ("docs", "sets", "prefix", "freq", "labels", "ledger"):
        snapshot_compact(spark, f"{store}/{n}", target_files=1)
        snapshot_vacuum(spark, f"{store}/{n}", keep_last=1)

    with pytest.raises(RuntimeError, match="cannot be accounted"):
        curate_ingest_batch(batch([201, 202]), 1, store)


def test_streaming_curate_edge_inputs_ledger_identity(spark, tmp_path):
    """Degenerate inputs through the full chain: NULL text, empty
    string, sub-k one-token doc.  The ledger identity must hold for
    ANY input (no doc silently vanishes uncounted, none double-counts)
    and the engine must not crash in any stage."""
    rows = [
        (1, None),
        (2, ""),
        (3, "the"),
        (4, _body(4, 24)),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    store = str(tmp_path / "store")
    row = curate_ingest_batch(
        docs, 0, store, threshold=0.5, k=5,
        boilerplate_max_df=2, span_dedup_k=6, span_min_docs=6,
    )
    assert row["n_batch"] == 4
    assert row["n_batch"] == (
        row["n_boilerplate"] + row["n_span"] + row["n_quality"]
        + row["n_decontam"] + row["n_semantic"] + row["n_dedup"]
        + row["n_kept"]
    )
    kept = {r.doc_id for r in curate_corpus_read(spark, store).collect()}
    assert kept == {4} and row["n_kept"] == 1


def test_streaming_curate_mixture_equals_batch(spark, tmp_path):
    """Round-12: the streaming mixture twin.  Same corpus regime as
    the main twin test plus a source column; the 'code' budget is
    sized to exhaust DURING batch 2, so equality proves the running
    spend carries across batches (not just per-batch budgeting).
    Sources: survivors get 'code', everything else 'web' (big budget),
    and the unlisted source 'forum' must vanish from the mix while
    staying in the corpus."""
    rows1 = _mk_batch(0, first=True)
    rows2 = _mk_batch(100, first=False)

    def src_of(doc_id: int, base: int) -> str:
        off = doc_id - base
        if 30 <= off < 35:
            return "code"     # the plain unique survivors
        if off < 6:
            return "forum"    # header docs: unlisted -> out of mix
        return "web"

    rows = [(i, t, src_of(i, 0 if i < 100 else 100)) for i, t in rows1 + rows2]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    )

    # budget sized from the DATA (not hand-predicted token counts):
    # 1.2x one batch's code tokens -> batch-1 code all kept, batch-2
    # exhausts after ~1-2 docs
    from ros_sql_spark.functions.text import token_count_bpe

    code1 = docs.filter(
        (F.col("source") == "code") & (F.col("doc_id") < 100)
    ).agg(F.sum(token_count_bpe("text")).alias("t")).collect()[0]["t"]
    budgets = {"code": int(1.2 * code1), "web": 10_000_000}

    res = curate(
        docs,
        near_dup_threshold=0.5,
        near_dup_method="setsim",
        shingle_k=5,
        boilerplate_passage_tokens=10,
        budgets=budgets,
        **_POLICY,
    )
    batch_kept = {
        (r.doc_id, r.text)
        for r in res.docs.select("doc_id", "text").collect()
    }

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [r for r in rows if r[0] < 100], docs.schema
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [r for r in rows if r[0] >= 100], docs.schema
    ).coalesce(1).write.mode("append").parquet(src)
    store = str(tmp_path / "store")
    q = curate_ingest_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src),
        store,
        checkpoint_path=str(tmp_path / "ck1"),
        threshold=0.5,
        k=5,
        budgets=budgets,
        **_POLICY,
    )
    q.awaitTermination(240)
    assert not q.isActive

    from ros_sql_spark.streaming.curate import curate_mix_read

    mix = curate_mix_read(spark, store).collect()
    assert {(r.doc_id, r.text) for r in mix} == batch_kept

    # cross-batch spend engaged: batch 1's five code docs all kept,
    # batch 2 only until the budget crossed — strictly between
    n_code = sum(1 for r in mix if r.source == "code")
    assert 5 < n_code < 10, n_code
    # unlisted source absent from the mix, present in the corpus
    assert all(r.source != "forum" for r in mix)
    corpus_ids = {
        r.doc_id for r in curate_corpus_read(spark, store).collect()
    }
    assert any(
        i for (i, _t, s) in rows if s == "forum" and i in corpus_ids
    )
    # the mix is a SELECTION over the published corpus (docstring)
    assert {r.doc_id for r in mix} <= corpus_ids
    # per-source spend never exceeds budget by more than one boundary
    # doc (the keep-iff-tokens-BEFORE-fit rule)
    spend = {}
    for r in mix:
        spend[r.source] = spend.get(r.source, 0) + r.n_tok
    for s, spent in spend.items():
        over = spent - budgets[s]
        assert over <= max(r.n_tok for r in mix if r.source == s), (s, over)

    # redelivery from a fresh checkpoint: mix versions untouched
    from ros_sql_spark.sources.snapshot import snapshot_versions

    v = snapshot_versions(spark, f"{store}/mix")[-1]
    q2 = curate_ingest_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src),
        store,
        checkpoint_path=str(tmp_path / "ck2"),
        threshold=0.5,
        k=5,
        budgets=budgets,
        **_POLICY,
    )
    q2.awaitTermination(240)
    assert snapshot_versions(spark, f"{store}/mix")[-1] == v
    assert {
        (r.doc_id, r.text) for r in curate_mix_read(spark, store).collect()
    } == batch_kept


def test_streaming_curate_mixture_crash_seams(spark, tmp_path, monkeypatch):
    """Round-12: crash injection at BOTH mixture seams.  (a) Crash
    AFTER docs committed, BEFORE the mix commit: the replay must
    re-spend against the PRE-batch balance (time travel) and land
    exactly the kept set the un-crashed run would have.  (b) Crash
    AFTER mix, BEFORE ledger: the replay must skip the mix table
    (watermark) and never double-spend — one mix version, stable
    across a further full replay."""
    import ros_sql_spark.streaming.curate as sc
    from ros_sql_spark.sources.snapshot import snapshot_versions
    from ros_sql_spark.streaming.curate import curate_mix_read

    rows = [
        (i, " ".join("the" if j % 7 == 0 else f"m{i}w{j}" for j in range(20)),
         "code" if i % 2 == 0 else "web")
        for i in range(30)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    )
    budgets = {"code": 120, "web": 10_000_000}
    store = str(tmp_path / "store")
    real_commit = sc.snapshot_commit

    # --- seam (a): crash before the FIRST mix commit
    state = {"crashed": False}

    def crash_mix(df, table, **kw):
        if table.endswith("/mix") and not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("injected crash before mix commit")
        return real_commit(df, table, **kw)

    monkeypatch.setattr(sc, "snapshot_commit", crash_mix)
    try:
        curate_ingest_batch(docs, 0, store, threshold=0.5, k=5,
                            budgets=budgets)
        raise AssertionError("injected crash did not fire")
    except RuntimeError:
        pass
    monkeypatch.setattr(sc, "snapshot_commit", real_commit)
    row = curate_ingest_batch(docs, 0, store, threshold=0.5, k=5,
                              budgets=budgets)
    mix0 = {(r.doc_id, r.n_tok) for r in curate_mix_read(spark, store).collect()}
    assert mix0, "mixture kept nothing"
    spend0 = sum(t for (_i, t) in mix0 if _i % 2 == 0)
    # the boundary rule: code spend exceeds budget by at most one doc
    assert spend0 - budgets["code"] <= max(
        t for (i, t) in mix0 if i % 2 == 0
    )

    # --- seam (b): batch 1 crashes between mix and ledger
    rows2 = [
        (100 + i,
         " ".join("the" if j % 7 == 0 else f"z{i}y{j}" for j in range(20)),
         "code" if i % 2 == 0 else "web")
        for i in range(30)
    ]
    docs2 = spark.createDataFrame(
        rows2, "doc_id bigint, text string, source string"
    )
    state2 = {"crashed": False}

    def crash_ledger(df, table, **kw):
        if table.endswith("/ledger") and not state2["crashed"]:
            state2["crashed"] = True
            raise RuntimeError("injected crash before ledger commit")
        return real_commit(df, table, **kw)

    monkeypatch.setattr(sc, "snapshot_commit", crash_ledger)
    try:
        curate_ingest_batch(docs2, 1, store, threshold=0.5, k=5,
                            budgets=budgets)
        raise AssertionError("injected crash did not fire")
    except RuntimeError:
        pass
    monkeypatch.setattr(sc, "snapshot_commit", real_commit)
    v_mix = snapshot_versions(spark, f"{store}/mix")[-1]
    curate_ingest_batch(docs2, 1, store, threshold=0.5, k=5,
                        budgets=budgets)
    # replay skipped the already-committed mix (no double-spend)
    assert snapshot_versions(spark, f"{store}/mix")[-1] == v_mix
    led = sorted(
        curate_ledger_read(spark, store).collect(), key=lambda r: r.batch_id
    )
    assert [r.batch_id for r in led] == [0, 1]
    # cross-batch spend: batch-1 code admissions bounded by the
    # RESIDUAL (already-exhausted-or-nearly budget), not a fresh one
    mix_all = curate_mix_read(spark, store).collect()
    code_spend = sum(r.n_tok for r in mix_all if r.source == "code")
    assert code_spend - budgets["code"] <= max(
        (r.n_tok for r in mix_all if r.source == "code"), default=0
    )
    # a further FULL replay of both batches changes nothing
    vs = {
        n: snapshot_versions(spark, f"{store}/{n}")[-1]
        for n in ("docs", "mix", "ledger")
    }
    curate_ingest_batch(docs, 0, store, threshold=0.5, k=5, budgets=budgets)
    curate_ingest_batch(docs2, 1, store, threshold=0.5, k=5, budgets=budgets)
    for n, v in vs.items():
        assert snapshot_versions(spark, f"{store}/{n}")[-1] == v, n
