"""Bloom-filter membership operators: no false negatives (the sketch's
hard guarantee), bounded false positives, word-table compactness, plan
shape (broadcast probe join, corpus never collected), and the curate()
bloom decontamination path vs the exact broadcast path."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ros_sql_spark.operators.bloom import (
    bloom_build,
    bloom_contaminated_ids,
    bloom_decontaminate,
    bloom_probe,
)
from ros_sql_spark.sources.io import load_table
from tests.conftest import SF_SMALL


def test_bloom_build_word_table_is_compact(spark):
    keys = spark.range(5000).select(F.col("id").alias("k"))
    m_bits = 1 << 16  # 64 Ki bits -> at most 1024 word rows
    words = bloom_build(keys, "k", m_bits)
    rows = words.collect()
    assert 0 < len(rows) <= m_bits // 64
    assert all(r.bits != 0 for r in rows)


def test_bloom_build_rejects_unaligned_m(spark):
    keys = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(keys, "k", 1000)


def test_bloom_probe_no_false_negatives_and_bounded_fp(spark):
    """Every inserted key probes True (hard guarantee); disjoint keys
    probe True at well under 1% with 20 bits/key."""
    inserted = spark.range(4000).select(F.col("id").alias("k"))
    m_bits = ((20 * 4000 + 63) // 64) * 64
    words = bloom_build(inserted, "k", m_bits)
    self_hits = bloom_probe(inserted, "k", words, m_bits)
    assert self_hits.filter(~F.col("maybe_member")).count() == 0
    outside = spark.range(100000, 140000).select(F.col("id").alias("k"))
    fp = bloom_probe(outside, "k", words, m_bits).filter(
        F.col("maybe_member")
    ).count()
    assert fp < 400  # 1% of 40k; expected ~1e-4 rate -> ~4


def test_bloom_probe_carries_input_columns(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("payload")
    )
    words = bloom_build(df.limit(50), "k", 1 << 12, k=5)
    out = bloom_probe(df, "k", words, 1 << 12, k=5)
    assert set(out.columns) == {"k", "payload", "maybe_member"}
    got = {r.k: r.payload for r in out.collect()}
    assert len(got) == 100 and all(got[i] == 2 * i for i in got)


def _shingle_frames(spark, docs, eval_docs, k=5):
    from ros_sql_spark.operators.dedup import shingle_hashes

    eval_sh = (
        shingle_hashes(eval_docs, "doc_id", "text", k)
        .select(F.explode_outer("_hs").alias("s"))
        .filter(F.col("s").isNotNull())
        .distinct()
    )
    cur_sh = shingle_hashes(docs, "doc_id", "text", k).select(
        "doc_id", F.explode_outer("_hs").alias("s")
    )
    return eval_sh, cur_sh


def test_bloom_decontaminate_never_misses_contamination(spark):
    """Bloom survivors ⊆ exact survivors: every doc the exact semi-join
    flags is also flagged by the Bloom path (no false negatives), and
    over-dropping stays under 2% of the corpus."""
    docs = load_table(spark, SF_SMALL, "documents")
    evald = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    eval_sh, cur_sh = _shingle_frames(spark, corpus, evald)

    exact_contam = {
        r.doc_id
        for r in cur_sh.join(F.broadcast(eval_sh), "s", "left_semi")
        .select("doc_id")
        .distinct()
        .collect()
    }
    bloom_out = bloom_decontaminate(corpus, eval_sh, cur_sh)
    survivors = {r.doc_id for r in bloom_out.select("doc_id").collect()}
    assert survivors.isdisjoint(exact_contam)  # nothing contaminated survives
    n_corpus = corpus.count()
    over_dropped = (n_corpus - len(survivors)) - len(exact_contam)
    assert 0 <= over_dropped <= max(2, n_corpus // 50)


def test_bloom_plan_broadcast_probe_no_corpus_shuffle_of_text(spark):
    """The probe side plan must broadcast the WORD table (not the eval
    strings) and contain no cartesian product."""
    docs = load_table(spark, SF_SMALL, "documents")
    evald = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    eval_sh, cur_sh = _shingle_frames(spark, corpus, evald)
    ids = bloom_contaminated_ids(eval_sh, cur_sh, m_bits=1 << 16)
    plan = ids._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.slow  # >=10s in the r11 duration profile
def test_curate_bloom_decontam_matches_broadcast_on_clean_data(spark):
    """curate(decontam_method='bloom') must drop a superset of the
    broadcast path's decontam stage (equal when no FP lands) and keep
    metrics() observation accounting consistent."""
    from ros_sql_spark.pipeline import curate

    docs = load_table(spark, SF_SMALL, "documents")
    evald = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    exact = curate(corpus, eval_docs=evald)
    bloom = curate(corpus, eval_docs=evald, decontam_method="bloom")
    exact_ids = {r.doc_id for r in exact.docs.select("doc_id").collect()}
    bloom_ids = {r.doc_id for r in bloom.docs.select("doc_id").collect()}
    assert bloom_ids <= exact_ids
    assert len(exact_ids) - len(bloom_ids) <= max(2, len(exact_ids) // 50)
    m = bloom.metrics()
    assert m["kept"] == len(bloom_ids)
    assert m["decontam"] >= exact.metrics()["decontam"]
    with pytest.raises(ValueError, match="decontam_method"):
        curate(corpus, eval_docs=evald, decontam_method="nope")
