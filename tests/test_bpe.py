"""BPE training/encoding (operators/bpe.py): the distributed trainer
must equal the pure-Python sequential reference bit-for-bit — same
merges, same order — and the Arrow encoder must equal the reference
priority-loop encode."""

from __future__ import annotations

import pyspark.sql.functions as F

from ros_sql_spark.operators.bpe import (
    _encode_word,
    _word_histogram,
    bpe_encode,
    bpe_train,
    bpe_train_reference,
)
from tests.conftest import SF_SMALL


def test_bpe_train_matches_reference_on_corpus(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    wc = [(r.w, r.n) for r in _word_histogram(docs, "text", 300).collect()]
    got = bpe_train(docs, num_merges=20, max_words=300)
    want = bpe_train_reference(wc, 20)
    assert got == want and len(got) == 20


def test_bpe_train_uncapped_classic_example(spark):
    """The Sennrich paper's canonical corpus: merges must follow the
    deterministic (count desc, pair asc) schedule."""
    rows = [("low " * 5).strip(), ("lower " * 2).strip(),
            ("newest " * 6).strip(), ("widest " * 3).strip()]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(rows)],
                                 "doc_id long, text string")
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    got = bpe_train(docs, num_merges=6)
    assert got == bpe_train_reference(sorted(wc), 6)
    # first merge is the corpus's most frequent adjacency: 'es' (9)
    assert got[0] == ("e", "s")


def test_bpe_greedy_overlap_semantics(spark):
    """'aaaa' under merge (a,a) must become [aa, aa] (non-overlapping
    left-to-right greedy), then (aa,aa) -> [aaaa] — the fold's
    just-written-token guard."""
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa aa")], "doc_id long, text string"
    )
    got = bpe_train(docs, num_merges=2, min_pair_count=1)
    assert got == bpe_train_reference([("aaaa", 3), ("aa", 1)], 2, 1)
    assert got[0] == ("a", "a")
    ranks = {p: i for i, p in enumerate(got)}
    assert _encode_word("aaaa", ranks) == ["aaaa"] if got[1] == ("aa", "aa") \
        else _encode_word("aaaa", ranks) == ["aa", "aa"]


def test_bpe_encode_matches_reference(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(80)
    merges = bpe_train(docs, num_merges=15, max_words=200)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r.doc_id: r.n_tok for r in bpe_encode(docs, merges).collect()}
    for r in docs.select("doc_id", "text").collect():
        want = sum(
            len(_encode_word(w, ranks))
            for w in r.text.lower().split(" ")
            if w
        )
        assert got[r.doc_id] == want, r.doc_id


def test_bpe_encode_zero_merges_is_char_count(spark):
    docs = spark.createDataFrame(
        [(0, "ab  cd"), (1, None), (2, "")], "doc_id long, text string"
    )
    got = {r.doc_id: r.n_tok for r in bpe_encode(docs, []).collect()}
    # double space yields an empty word (skipped); chars of nonempty words
    assert got == {0: 4, 1: 0, 2: 0}


def test_bpe_train_stops_below_min_pair_count(spark):
    docs = spark.createDataFrame(
        [(0, "ab cd ef")], "doc_id long, text string"
    )
    # every adjacency is unique (count 1) -> no merge at default min 2
    assert bpe_train(docs, num_merges=5) == []
