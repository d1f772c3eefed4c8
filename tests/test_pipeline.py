"""End-to-end curate() pipeline: row accounting, per-stage invariants."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ros_sql_spark.pipeline import curate
from ros_sql_spark.sources.io import load_table
from tests.conftest import SF_SMALL


def _ids(df, col="doc_id"):
    return {r[0] for r in df.select(col).collect()}


def test_curate_partitions_the_input(spark):
    """Survivors + per-stage drops form a disjoint partition of the
    input ids, and each stage's invariant holds on the final set:
    no surviving exact-duplicate digests, no surviving near-dup pair,
    no shingle overlap with the eval set."""
    docs = load_table(spark, SF_SMALL, "documents")
    evald = docs.filter(F.col("doc_id") % 17 == 0)
    train = docs.filter(F.col("doc_id") % 17 != 0)
    res = curate(train, eval_docs=evald)

    all_ids = _ids(train)
    kept = _ids(res.docs)
    stage_ids = {name: _ids(df) for name, df in res.dropped.items()}

    # disjoint partition
    union = set(kept)
    total = len(kept)
    for s in stage_ids.values():
        union |= s
        total += len(s)
    assert union == all_ids
    assert total == len(all_ids), "stages overlap or leak ids"
    assert len(kept) > 0

    # exact: no two survivors share a content digest
    dup = (
        res.docs.groupBy(F.md5(F.col("text").cast("binary")))
        .count()
        .filter(F.col("count") > 1)
    )
    assert dup.count() == 0

    # near-dup: re-running pair generation over the survivors finds no
    # pair (any such pair was an edge, so both ends shared a component
    # and only one survived)
    from ros_sql_spark.operators.dedup import minhash_pairs

    left_pairs = minhash_pairs(res.docs, threshold=0.5)
    assert left_pairs.count() == 0

    # decontam: no surviving doc shares a 5-shingle hash with eval
    from ros_sql_spark.operators.dedup import shingle_hashes

    ev = (
        shingle_hashes(evald, "doc_id", "text", 5)
        .select(F.explode_outer("_hs").alias("s"))
        .distinct()
    )
    sv = shingle_hashes(res.docs, "doc_id", "text", 5).select(
        "doc_id", F.explode_outer("_hs").alias("s")
    )
    assert sv.join(ev, "s", "left_semi").count() == 0


def test_curate_metrics_single_pass(spark):
    """metrics() row accounting agrees with the per-stage frames, and
    it must not launch one job per stage: after the first call every
    counter is cached, and the counts come from CollectMetrics nodes
    riding the survivors' plan."""
    docs = load_table(spark, SF_SMALL, "documents")
    evald = docs.filter(F.col("doc_id") % 17 == 0)
    res = curate(docs.filter(F.col("doc_id") % 17 != 0), eval_docs=evald)

    m = res.metrics()
    assert m == res.metrics()  # cached
    assert m["input"] == m["kept"] + sum(
        m[s] for s in ("quality", "exact", "near_dup", "decontam")
    )
    # spot-check against the authoritative frames
    assert m["kept"] == res.docs.count()
    assert m["quality"] == res.dropped["quality"].count()
    assert m["decontam"] == res.dropped["decontam"].count()


@pytest.mark.slow  # >=10s in the r11 duration profile
def test_curate_semantic_stage(spark):
    """With embeddings supplied, the semantic stage drops
    paraphrase-level dups: survivors have no cosine>=threshold LSH pair
    left among them, and the row accounting still partitions the
    input.

    sf0.001 has no natural cosine>=0.9 pair (verified — the no-pairs
    assertion below would be vacuous), so inject them: for 5 sampled
    docs add TWO clones each (ids +1e6/+2e6) sharing the original's
    embedding vector exactly, with interleaved-id filler texts — every
    3-shingle contains the clone id, so the texts are quality-passing
    yet exact- and minhash-disjoint, and only the semantic stage can
    pair them (cosine == 1.0)."""
    docs = load_table(spark, SF_SMALL, "documents")
    emb = load_table(spark, SF_SMALL, "embeddings")

    base = docs.orderBy("doc_id").limit(5)
    idtok = F.col("doc_id").cast("string")
    filler = F.concat_ws(
        " ",
        *[
            piece
            for w in ("the", "and", "of", "to", "in", "is", "was")
            for piece in (F.lit(w), idtok)
        ],
    )

    def clones(offset):
        return (
            base.withColumn("doc_id", F.col("doc_id") + offset)
            .withColumn("text", filler)
            .withColumn("n_chars", F.length(filler))
            .select(docs.columns)
        )

    aug_docs = docs.unionByName(clones(1_000_000)).unionByName(
        clones(2_000_000)
    )
    base_vecs = emb.join(
        base.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    aug_emb = emb.unionByName(
        base_vecs.withColumn("vec_id", F.col("vec_id") + 1_000_000)
    ).unionByName(base_vecs.withColumn("vec_id", F.col("vec_id") + 2_000_000))

    res = curate(aug_docs, embeddings=aug_emb, cosine_threshold=0.9)

    # each injected clone pair must lose at least one member here, and
    # the observation-backed accounting must agree on a NONZERO count
    n_sem = res.dropped["semantic_dup"].count()
    assert n_sem >= 5
    assert res.metrics()["semantic_dup"] == n_sem

    all_ids = _ids(aug_docs)
    union, total = set(_ids(res.docs)), res.docs.count()
    for df in res.dropped.values():
        s = _ids(df)
        union |= s
        total += len(s)
    assert union == all_ids and total == len(all_ids)
    assert "semantic_dup" in res.dropped

    from ros_sql_spark.operators.similarity import cosine_dedup_pairs_lsh

    surv_vecs = aug_emb.select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("_vec")
    ).join(res.docs.select("doc_id"), "doc_id", "left_semi")
    left = cosine_dedup_pairs_lsh(
        surv_vecs, threshold=0.9, id_col="doc_id", vec_col="_vec"
    )
    assert left.count() == 0


def test_curate_mixture_stage(spark):
    """budgets= adds the q83 token-budget cut as the final stage:
    unlisted sources drop entirely, listed sources keep their id-ordered
    prefix under the budget, and the row accounting still partitions."""
    docs = load_table(spark, SF_SMALL, "documents")
    budgets = {"src0": 400, "src3": 250}
    res = curate(docs, budgets=budgets)

    kept_rows = res.docs.collect()
    assert {r.source for r in kept_rows} <= set(budgets)

    # partition invariant still holds with the new stage
    all_ids = _ids(docs)
    union = _ids(res.docs)
    total = len(union)
    for df in res.dropped.values():
        s = _ids(df)
        union |= s
        total += len(s)
    assert union == all_ids
    assert total == len(all_ids)

    # budget honored: all but the boundary doc fit strictly
    from ros_sql_spark.functions.text import token_count_bpe

    toks = {
        r.doc_id: r.n
        for r in res.docs.select(
            "doc_id", token_count_bpe("text").alias("n")
        ).collect()
    }
    for src, budget in budgets.items():
        ids_in = sorted(r.doc_id for r in kept_rows if r.source == src)
        cum = 0
        for did in ids_in:
            assert cum < budget, f"{src}: doc {did} started beyond budget"
            cum += toks[did]

    # metrics include the mixture stage and add up
    m = res.metrics()
    assert "mixture" in m
    assert m["input"] == m["kept"] + sum(
        v for k, v in m.items() if k not in ("input", "kept")
    )


def test_curate_boilerplate_stage(spark):
    """boilerplate_max_df= prepends the q85 strip: a planted shared
    header disappears from every surviving text, fully-boilerplate docs
    are accounted as dropped, and the id partition still holds."""
    hdr = "shared header tokens one two three four five six seven"
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id",
        F.concat(F.lit(hdr + " "), F.col("text")).alias("text"),
    )
    # one doc that is ONLY the header -> fully boilerplate
    only_hdr = spark.createDataFrame([(999999, hdr)], "doc_id long, text string")
    docs = docs.unionByName(only_hdr)

    res = curate(docs, boilerplate_max_df=3)
    kept_rows = res.docs.collect()
    assert kept_rows, "pipeline dropped everything"
    assert all(hdr not in r.text for r in kept_rows)
    assert 999999 in _ids(res.dropped["boilerplate"])

    all_ids = _ids(docs)
    union = _ids(res.docs)
    total = len(union)
    for df in res.dropped.values():
        s = _ids(df)
        union |= s
        total += len(s)
    assert union == all_ids
    assert total == len(all_ids)

    m = res.metrics()
    assert m["input"] == docs.count()
    assert m["boilerplate"] >= 1
    assert m["input"] == m["kept"] + sum(
        v for k, v in m.items() if k not in ("input", "kept")
    )


def test_curate_metrics_no_fallback_on_standard_path(spark, caplog):
    """The standard curate() → metrics() path must fill EVERY counter
    from CollectMetrics observations — zero fallback recount jobs.  A
    fallback engagement is logged as a warning, so a regression in the
    observation wiring shows up here instead of silently turning
    metrics() into one job per stage."""
    import logging

    docs = load_table(spark, SF_SMALL, "documents")
    res = curate(docs)
    with caplog.at_level(logging.WARNING, logger="ros_sql_spark.pipeline"):
        m = res.metrics()
    assert m["input"] == m["kept"] + m["quality"] + m["exact"] + m["near_dup"]
    fallback_msgs = [
        r for r in caplog.records if "fell back to a recount" in r.message
    ]
    assert fallback_msgs == []


def test_publish_curated_snapshot(spark, tmp_path):
    """curate -> publish: atomic snapshot holds exactly the survivors,
    id-stats enable pruned reads, and metrics() after the publish costs
    no extra jobs (observations fired by the commit's write action)."""
    from ros_sql_spark.pipeline import curate, publish_curated
    from ros_sql_spark.sources.io import load_table
    from ros_sql_spark.sources.snapshot import snapshot_read
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    res = curate(docs)
    t = str(tmp_path / "curated")
    v = publish_curated(res, t, cluster_files=4)
    assert v == 1
    stored = snapshot_read(spark, t)
    m = res.metrics()
    assert stored.count() == m["kept"]
    assert len(stored.inputFiles()) == 4
    ids = [r.doc_id for r in stored.select("doc_id").collect()]
    lo = sorted(ids)[len(ids) // 4]
    pruned = snapshot_read(spark, t, prune={"doc_id": (None, lo)})
    assert 0 < len(pruned.inputFiles()) < 4
    assert pruned.filter(f"doc_id <= {lo}").count() == sum(
        1 for i in ids if i <= lo
    )


@pytest.mark.slow  # >=10s in the r11 duration profile
def test_curate_span_dedup_stage(spark):
    """span_dedup_k= excises a planted cross-doc span before gating:
    the span vanishes from every surviving text, a wall-to-wall
    duplicated doc is accounted as dropped, and the id partition +
    metrics ledger still balance."""
    span = (
        "shared span alpha beta gamma delta epsilon zeta eta theta "
        "iota kappa"
    )
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" " + span)).alias("text"),
    )
    only_span = spark.createDataFrame(
        [(999999, span)], "doc_id long, text string"
    )
    docs = docs.unionByName(only_span)

    res = curate(docs, span_dedup_k=6, span_min_docs=3)
    kept_rows = res.docs.collect()
    assert kept_rows, "pipeline dropped everything"
    assert all("shared span alpha" not in r.text for r in kept_rows)
    assert 999999 in _ids(res.dropped["span_dedup"])

    all_ids = _ids(docs)
    union = _ids(res.docs)
    total = len(union)
    for df in res.dropped.values():
        s = _ids(df)
        union |= s
        total += len(s)
    assert union == all_ids
    assert total == len(all_ids)

    m = res.metrics()
    assert m["input"] == docs.count()
    assert m["span_dedup"] >= 1
    assert m["input"] == m["kept"] + sum(
        v for k, v in m.items() if k not in ("input", "kept")
    )


def test_curate_near_dup_optional(spark):
    """near_dup_threshold=None skips stage 3 entirely: no near_dup
    drop frame, no minhash jobs in the lineage, and the remaining
    stages still partition the input — the composition qx06 gates."""
    docs = load_table(spark, SF_SMALL, "documents")
    res = curate(docs, boilerplate_max_df=2, near_dup_threshold=None)
    assert "near_dup" not in res.dropped
    assert "near_dup" not in res.metrics()
    kept = _ids(res.docs)
    union = set(kept)
    total = len(kept)
    for s in (_ids(df) for df in res.dropped.values()):
        union |= s
        total += len(s)
    assert union == _ids(docs) and total == len(_ids(docs))
    assert len(kept) > 0
    # exact-dedup invariant still holds on the composition's output
    dup = (
        res.docs.groupBy(F.md5(F.col("text").cast("binary")))
        .count()
        .filter(F.col("count") > 1)
    )
    assert dup.count() == 0

@pytest.mark.slow  # >=10s in the r11 duration profile
def test_curate_setsim_method_and_incremental_ingest(spark):
    """near_dup_method='setsim' runs the EXACT join inside curate (no
    surviving pair at the threshold), and the incremental ingest shape
    (setsim_base_index) drops every batch doc whose cluster touches the
    indexed base while partitioning the batch ids as usual."""
    from ros_sql_spark.operators.dedup import setsim_index, setsim_join

    docs = load_table(spark, SF_SMALL, "documents")

    # batch-only: exact join replaces minhash, invariant = no pair left
    batch = docs.filter(F.col("doc_id") < 150)
    res = curate(
        batch, near_dup_threshold=0.3, near_dup_method="setsim",
        shingle_k=5,
    )
    assert setsim_join(res.docs, threshold=0.3, k=5).count() == 0
    kept = _ids(res.docs)
    union, total = set(kept), len(kept)
    for df in res.dropped.values():
        s = _ids(df)
        union |= s
        total += len(s)
    assert union == _ids(batch) and total == len(_ids(batch))

    # ingest shape: base = the curated survivors; the batch mixes fresh
    # docs with exact twins of base docs (id-shifted so ids stay
    # disjoint — twins carry J=1.0 >= threshold against the base)
    base = res.docs
    base_idx = setsim_index(base, threshold=0.3, k=5)
    dup_of_base = base.limit(20).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    fresh = docs.filter(
        (F.col("doc_id") >= 150) & (F.col("doc_id") < 300)
    ).select("doc_id", "text")
    batch2 = fresh.unionByName(dup_of_base)
    res2 = curate(
        batch2, near_dup_threshold=0.3, near_dup_method="setsim",
        setsim_base_index=base_idx, shingle_k=5,
    )
    kept2 = _ids(res2.docs)
    # every exact twin of a base doc is gone (published corpus wins)
    assert not {i for i in kept2 if i >= 100000}
    # the partition invariant still holds for the batch
    union2, total2 = set(kept2), len(kept2)
    for df in res2.dropped.values():
        s = _ids(df)
        union2 |= s
        total2 += len(s)
    assert union2 == _ids(batch2) and total2 == len(_ids(batch2))
    # and no base id ever appears in a drop frame (base is not curatable)
    base_ids = _ids(base)
    for name, df in res2.dropped.items():
        assert not (_ids(df) & base_ids), name


def test_curate_rejects_inconsistent_setsim_base_index(spark):
    """Passing a base index without the setsim method (or with near-dup
    off) must raise — silently ignoring it would curate an ingest batch
    without ever comparing it to the published corpus."""
    import pytest

    from ros_sql_spark.operators.dedup import setsim_index

    docs = load_table(spark, SF_SMALL, "documents").filter(
        F.col("doc_id") < 40
    )
    idx = setsim_index(docs, threshold=0.3, k=5)
    with pytest.raises(ValueError, match="setsim_base_index requires"):
        curate(docs, setsim_base_index=idx)  # default method='minhash'
    with pytest.raises(ValueError, match="setsim_base_index requires"):
        curate(
            docs, setsim_base_index=idx, near_dup_method="setsim",
            near_dup_threshold=None,
        )
