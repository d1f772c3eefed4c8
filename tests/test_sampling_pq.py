"""Sampling operators (deterministic weighted sample, token-budget mix)
and product-quantization ANN: invariants + recall vs the exact baseline."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from ros_sql_spark.operators.pq import pq_encode, pq_knn, pq_train
from ros_sql_spark.operators.sampling import (
    token_budget_mix,
    uniform_from_id,
    weighted_sample,
)
from ros_sql_spark.operators.similarity import brute_force_knn
from ros_sql_spark.sources.io import load_table
from tests.conftest import SF_SMALL


# ---------------------------------------------------------------- sampling
def test_uniform_from_id_is_uniform_and_deterministic(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    u = docs.select(uniform_from_id("doc_id").alias("u"))
    stats = u.agg(
        F.min("u").alias("lo"), F.max("u").alias("hi"), F.avg("u").alias("mu")
    ).collect()[0]
    assert 0.0 < stats.lo and stats.hi < 1.0
    assert abs(stats.mu - 0.5) < 0.1  # 50 docs: loose CLT bound
    a = sorted(r.u for r in u.collect())
    b = sorted(r.u for r in u.collect())
    assert a == b  # rerun-identical (no rand())


def test_weighted_sample_invariants(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    k = 20
    s = weighted_sample(docs, "n_chars", k).collect()
    assert len(s) == k
    ids = [r.doc_id for r in s]
    assert len(set(ids)) == k  # without replacement
    # deterministic across reruns
    s2 = weighted_sample(docs, "n_chars", k).collect()
    assert sorted(ids) == sorted(r.doc_id for r in s2)
    # every sampled row keeps the input columns + audit priority
    assert set(s[0].asDict()) == set(docs.columns) | {"_priority"}


def test_weighted_sample_biases_toward_weight(spark):
    """Sampling by weight must overselect heavy rows vs uniform: the
    mean n_chars of a weighted sample exceeds the corpus mean (size-
    biased sampling has E[X_sample] = E[X²]/E[X] > E[X])."""
    docs = load_table(spark, SF_SMALL, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    s = weighted_sample(docs, "n_chars", 25)
    sample_mean = s.agg(F.avg("n_chars")).collect()[0][0]
    assert sample_mean > corpus_mean


def test_weighted_sample_rejects_nonpositive_weights(spark):
    docs = load_table(spark, SF_SMALL, "documents").withColumn(
        "w", F.when(F.col("doc_id") < 5, F.lit(-1)).otherwise(F.col("n_chars"))
    )
    s = weighted_sample(docs, "w", 45).collect()
    assert all(r.doc_id >= 5 for r in s)


def test_token_budget_mix_respects_budgets(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    budgets = {"src0": 300, "src1": 150}
    out = token_budget_mix(
        docs,
        budgets,
        token_col="n_chars",
        order_by=[F.desc("n_chars"), F.asc("doc_id")],
    )
    rows = out.collect()
    assert {r.source for r in rows} <= set(budgets)  # unlisted sources dropped
    for src, budget in budgets.items():
        picked = sorted(
            (r for r in rows if r.source == src), key=lambda r: r._cum
        )
        assert picked, f"budget for {src} selected nothing"
        # all but the boundary row fit strictly; the boundary row started
        # inside the budget
        for r in picked:
            assert r._cum - r._n_tok < budget
        # the selection is the PREFIX of the preference order: the last
        # kept row's cum is the first to reach/exceed the budget OR the
        # source is exhausted
        total_src = [r for r in docs.collect() if r.source == src]
        assert len(picked) <= len(total_src)


def test_token_budget_mix_prefix_property(spark):
    """Kept set = longest prefix of the preference order fitting the
    budget, computed independently in Python."""
    docs = load_table(spark, SF_SMALL, "documents")
    budget = 500
    out = token_budget_mix(
        docs, {"src2": budget}, token_col="n_chars",
        order_by=[F.desc("n_chars"), F.asc("doc_id")],
    ).collect()
    got = sorted(r.doc_id for r in out)
    src2 = sorted(
        ((r.n_chars, r.doc_id) for r in docs.collect() if r.source == "src2"),
        key=lambda t: (-t[0], t[1]),
    )
    want, cum = [], 0
    for n, did in src2:
        if cum < budget:
            want.append(did)
        cum += n
    assert got == sorted(want)


# ---------------------------------------------------------------------- pq
@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMALL, "embeddings")


def test_pq_encode_shape_and_determinism(spark, emb):
    books = pq_train(emb, dim=64, m=8, n_centroids=16, seed=7)
    assert books.shape == (8, 16, 8)
    codes = pq_encode(emb, books)
    rows = codes.collect()
    assert len(rows) == emb.count()
    assert all(len(r.pq_code) == 8 for r in rows)
    again = {r.vec_id: r.pq_code for r in pq_encode(emb, books).collect()}
    assert all(again[r.vec_id] == r.pq_code for r in rows)


def test_pq_knn_recall_vs_exact(spark, emb):
    """ADC + exact rerank must reach high recall@10 against brute force.

    dim 64 → m=8 subspaces × 16 centroids on this tiny corpus; the
    rerank makes the final ordering exact, so recall is the only
    approximation left."""
    queries = emb.filter(F.col("vec_id") < 5)
    books = pq_train(emb, dim=64, m=8, n_centroids=16, seed=7)
    codes = pq_encode(emb, books)
    approx = pq_knn(
        codes, queries, books, k=10, rerank=emb, rerank_factor=8
    ).collect()
    exact = brute_force_knn(emb, queries, k=10).collect()
    by_q_approx: dict[int, set] = {}
    for r in approx:
        by_q_approx.setdefault(r.query_id, set()).add(r.vec_id)
    by_q_exact: dict[int, set] = {}
    for r in exact:
        by_q_exact.setdefault(r.query_id, set()).add(r.vec_id)
    assert set(by_q_approx) == set(by_q_exact)
    hits = sum(
        len(by_q_approx[q] & by_q_exact[q]) for q in by_q_exact
    )
    total = sum(len(v) for v in by_q_exact.values())
    recall = hits / total
    assert recall >= 0.6, f"recall@10 {recall:.2f} below floor"


def test_pq_knn_adc_only_runs(spark, emb):
    """Without rerank the scores are ADC approximations — ordering and
    row shape must still hold (k rows per query, scores descending)."""
    queries = emb.filter(F.col("vec_id") < 3)
    books = pq_train(emb, dim=64, m=8, n_centroids=16, seed=7)
    codes = pq_encode(emb, books)
    rows = pq_knn(codes, queries, books, k=5).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.score)
    assert set(per_q) == {0, 1, 2}
    for scores in per_q.values():
        assert len(scores) == 5
        assert scores == sorted(scores, reverse=True)


def test_ivf_pq_knn_recall_vs_exact(spark, emb):
    """The composed IVF-PQ path (coarse cells prune candidates, ADC
    scores codes, exact rerank orders) must hold recall against brute
    force at generous probe width."""
    from ros_sql_spark.operators.pq import ivf_pq_knn

    queries = emb.filter(F.col("vec_id") < 5)
    approx = ivf_pq_knn(
        emb, queries, k=10, n_cells=8, n_probe=6, m=8, n_centroids=16,
        rerank=emb, rerank_factor=8,
    ).collect()
    exact = brute_force_knn(emb, queries, k=10).collect()
    ga: dict[int, set] = {}
    for r in approx:
        ga.setdefault(r.query_id, set()).add(r.vec_id)
    ge: dict[int, set] = {}
    for r in exact:
        ge.setdefault(r.query_id, set()).add(r.vec_id)
    assert set(ga) == set(ge)
    recall = sum(len(ga[q] & ge[q]) for q in ge) / sum(
        len(v) for v in ge.values()
    )
    assert recall >= 0.5, f"IVF-PQ recall@10 {recall:.2f} below floor"
    # per-query row shape: exactly k rows, scores descending
    for q, s in ga.items():
        assert len(s) == 10


def test_pq_train_validates_args(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, dim=64, m=7)
    with pytest.raises(ValueError, match="1-byte"):
        pq_train(emb, dim=64, m=8, n_centroids=512)


def test_pq_query_side_is_bounded(spark, emb):
    """The ANN query batch is a bounded-collect contract: an oversized
    query frame must fail FAST with an actionable error (before any
    ADC-table fan-out could OOM the driver), for both pq_knn and
    ivf_pq_knn; an explicit higher max_queries opts back in."""
    from ros_sql_spark.operators.pq import ivf_pq_knn

    books = pq_train(emb, dim=64, m=8, n_centroids=16, seed=7)
    codes = pq_encode(emb, books)
    big = emb  # 100 rows at sf0.001 — over a tiny limit
    with pytest.raises(ValueError, match="max_queries"):
        pq_knn(codes, big, books, k=3, max_queries=10)
    with pytest.raises(ValueError, match="max_queries"):
        ivf_pq_knn(emb, big, k=3, n_cells=4, n_probe=2,
                   n_centroids=16, max_queries=10)
    # raising the bound explicitly works
    got = pq_knn(codes, big.limit(12), books, k=3, max_queries=12).collect()
    assert got and len({r.query_id for r in got}) == 12


def test_ivf_pq_knn_join_matches_collected_path(spark, emb):
    """The DataFrame-query-side path must produce the same results as
    the collected path given the SAME prebuilt index and codebooks —
    the per-batch table construction is operation-identical numpy, so
    candidates and scores agree exactly (rerank makes final scores
    exact either way)."""
    from ros_sql_spark.operators.pq import ivf_pq_knn, ivf_pq_knn_join
    from ros_sql_spark.operators.similarity import ivf_index

    queries = emb.filter(F.col("vec_id") < 5)
    index = ivf_index(emb, n_cells=8, seed=42)
    # seed 42 = ivf_pq_knn's internal pq_train seed, so both paths
    # search over the identical codebooks
    books = pq_train(emb, dim=64, m=8, n_centroids=16, seed=42)
    kw = dict(
        k=10, n_probe=6, rerank=emb, rerank_factor=8, index=index,
    )
    collected = ivf_pq_knn(
        emb, queries, n_cells=8, m=8, n_centroids=16, **kw
    ).collect()
    joined = ivf_pq_knn_join(emb, queries, codebooks=books, **kw).collect()
    canon = lambda rows: sorted(
        (r.query_id, r.vec_id, r.score) for r in rows
    )
    assert canon(joined) == canon(collected)


def test_ivf_pq_knn_join_unbounded_queries(spark, emb):
    """The join path has NO max_queries: the whole corpus as the query
    frame runs fine (100 queries here; the shape is rows, not driver
    memory), k rows per query, self excluded."""
    from ros_sql_spark.operators.pq import ivf_pq_knn_join

    out = ivf_pq_knn_join(
        emb, emb, k=3, n_cells=8, n_probe=4, m=8, n_centroids=16,
    ).collect()
    per_q: dict[int, list] = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append((r.vec_id, r.score))
        assert r.vec_id != r.query_id
    assert len(per_q) == emb.count()
    for q, rows in per_q.items():
        assert len(rows) == 3


def test_shard_assignment_nondefault_counts_and_growth_rule(spark):
    """shard_assignment (round-7 directive: parameterized num_shards):
    non-default counts produce the same md5 bucketing Python computes;
    pos is dense 0..k-1 per shard; and the power-of-two growth rule
    holds — doubling num_shards splits shards hierarchically
    (shard_2N mod N == shard_N), so no row moves BETWEEN old shards."""
    import hashlib

    from ros_sql_spark.operators.sampling import shard_assignment
    from ros_sql_spark.sources.io import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id")

    def py_shard(doc_id, n):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % n

    by_n = {}
    for n in (8, 16, 64):
        rows = shard_assignment(docs, num_shards=n).collect()
        by_n[n] = {r.doc_id: (r.shard, r.pos) for r in rows}
        # bucketing matches the portable md5 arithmetic
        for r in rows:
            assert r.shard == py_shard(r.doc_id, n), (r.doc_id, n)
        # pos dense per shard
        per_shard = {}
        for r in rows:
            per_shard.setdefault(r.shard, []).append(r.pos)
        for s, ps in per_shard.items():
            assert sorted(ps) == list(range(len(ps))), (n, s)
    # growth rule: 8 -> 16 -> 64 all hierarchical
    for small, big in ((8, 16), (16, 64)):
        for doc_id, (s_small, _) in by_n[small].items():
            assert by_n[big][doc_id][0] % small == s_small, (doc_id, small, big)
    # growth preserves within-shard relative order of surviving pairs:
    # two docs in the same shard at BOTH sizes keep their pos order
    import itertools
    sample = list(itertools.islice(by_n[8].items(), 300))
    for (d1, (s1, p1)), (d2, (s2, p2)) in itertools.combinations(sample, 2):
        b1, q1 = by_n[64][d1]
        b2, q2 = by_n[64][d2]
        if s1 == s2 and b1 == b2:
            assert (p1 < p2) == (q1 < q2), (d1, d2)

    import pytest
    with pytest.raises(ValueError, match="num_shards"):
        shard_assignment(docs, num_shards=0)
