"""Byte-pair-encoding vocabulary TRAINING and encoding, Spark-first.

The reference suite's token counting (q37) uses a BPE-ish regex
pre-tokenizer; this module adds the real thing: learning the merge
table from the corpus itself — the step an LLM data pipeline runs once
per tokenizer revision, and the step that is corpus-scale-heavy (pair
counting touches every token occurrence).

Scale shape (the classic Sennrich et al. formulation, public
literature): the corpus collapses to its WORD HISTOGRAM first — one
explode + one groupBy, the only full-corpus pass — and every merge
round then runs on the histogram (vocabulary-sized: |distinct words|
rows, each weighted by its count), not the corpus.  Per round the
driver collects exactly ONE row (the argmax pair); the symbol-array
update is a JVM fold (CLAUDE.md's measured guidance: single-pass
array→array maps lose through Arrow), and lineage is truncated with
localCheckpoint every round, the connected-components discipline.

Merges are strictly sequential (round r+1's counts depend on round
r's merge), so rounds = num_merges — bounded by the vocab budget, not
the data.  Ties break on (count desc, left, right) so training is
deterministic; equality with a pure-Python reference implementation is
asserted in tests.
"""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["bpe_train", "bpe_encode", "bpe_train_reference"]


def _word_histogram(
    df: DataFrame, text_col: str, max_words: int | None
) -> DataFrame:
    """(word, n) — whitespace/lowercase word counts; optionally capped
    to the top-``max_words`` head (count desc, word asc — a
    deterministic cap so capped training is reproducible)."""
    words = (
        df.select(F.explode_outer(F.split(F.lower(text_col), " ")).alias("w"))
        .filter(F.col("w").isNotNull() & (F.col("w") != ""))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    if max_words is not None:
        words = words.orderBy(F.desc("n"), F.asc("w")).limit(max_words)
    return words


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 50,
    min_pair_count: int = 2,
    max_words: int | None = None,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ordered merge list [(left, right), ...].

    Each round: count adjacent symbol pairs over the word histogram
    (weighted by word count), collect the single argmax row, and merge
    that pair corpus-wide inside a JVM fold.  Stops early when the best
    pair's count falls below ``min_pair_count`` (merging singletons
    only memorizes words).  ``max_words`` caps the histogram to its
    deterministic head — full-fidelity training passes None; the cap
    exists so a bounded-latency training query can still be declared.
    """
    hist = _word_histogram(docs, text_col, max_words)
    # chars: split("ab", "") -> [a, b].  The round loop is ONE job per
    # merge: the symbol update is a LAZY localCheckpoint — the plan
    # truncates to a LogicalRDD immediately (so CollapseProject can
    # never re-inline the nested fold projections; cache() measured a
    # quadratic recompute exactly that way) and the next round's argmax
    # is the action that materializes it.
    cur = hist.select(
        F.split("w", "").alias("sym"), F.col("n")
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = (
            cur.select(
                F.explode_outer(
                    F.zip_with(
                        F.slice("sym", 1, F.size("sym") - 1),
                        F.slice("sym", 2, F.size("sym") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
                "n",
            )
            .filter(F.col("p").isNotNull())
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("cnt"))
        )
        best = pairs.orderBy(
            F.desc("cnt"), F.asc("l"), F.asc("r")
        ).limit(1).collect()
        if not best or best[0]["cnt"] < min_pair_count:
            break
        left, right = best[0]["l"], best[0]["r"]
        merges.append((left, right))
        # left-to-right single-pass merge, exactly the reference
        # semantics: a greedy scan replacing every non-overlapping
        # (left, right) adjacency.  The fold carries (acc array, skip
        # flag encoded as the sentinel last element) — plain JVM
        # expressions, one pass per row.
        la, ra = F.lit(left), F.lit(right)
        merged = F.aggregate(
            "sym",
            F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == la)
                & (s == ra)
                # guard: the element already consumed by a previous
                # merge must not re-merge — element_at(acc,-1) equal to
                # `left` only counts if it was NOT itself just written
                # as a merged token.  Writing the merged token la||ra
                # (≠ la unless ra empty) makes the guard implicit.
                ,
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(la, ra))),
            ).otherwise(F.concat(acc, F.array(s))),
        )
        cur = cur.select(merged.alias("sym"), "n").localCheckpoint(
            eager=False
        )
    return merges


def bpe_train_reference(
    word_counts: list[tuple[str, int]],
    num_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Pure-Python sequential BPE trainer (Sennrich-style) used as the
    test oracle for :func:`bpe_train` — same tie-break, same greedy
    left-to-right merge."""
    syms = {w: list(w) for w, _ in word_counts}
    counts = dict(word_counts)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pc: dict[tuple[str, str], int] = {}
        for w, s in syms.items():
            n = counts[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (l, r), _ = best
        merges.append((l, r))
        for w, s in syms.items():
            out: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges by PRIORITY (lowest rank first) until none apply —
    the standard BPE encode (GPT-2-style loop, public algorithm)."""
    s = list(word)
    while len(s) > 1:
        best_i, best_rank = -1, None
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        s[best_i : best_i + 2] = [s[best_i] + s[best_i + 1]]
    return s


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tok, n_chars) — encode each document with the learned
    merge table and count its BPE tokens.

    The merge table is driver-state (vocab-budget-bounded — tens of
    thousands of entries, never data-sized) shipped in the UDF closure;
    encoding is the priority-loop BPE algorithm per word, which is real
    compute per transferred byte — the Arrow pandas_udf regime
    (CLAUDE.md's measured boundary), unlike the single-pass folds that
    stay JVM-side."""
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf("long")
    def _n_tok(texts: pd.Series) -> pd.Series:
        def enc(t):
            if t is None:
                return 0
            total = 0
            for w in t.lower().split(" "):
                if w:
                    total += len(_encode_word(w, ranks))
            return total

        return texts.map(enc)

    return docs.select(
        id_col,
        _n_tok(F.col(text_col)).alias("n_tok"),
        F.length(text_col).cast("bigint").alias("n_chars"),
    )
