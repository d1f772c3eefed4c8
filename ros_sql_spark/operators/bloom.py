"""Bloom-filter membership at cluster scale — all-JVM DataFrame ops.

Why this exists: the broadcast semi-join decontamination (q20,
``pipeline.curate``) is exact but requires the *eval shingle table* to
fit in a broadcast.  At 100 TB the held-out set itself can be huge; the
scalable shape is the classic one (Bloom 1970, public literature): build
a fixed-size bit array over the eval shingles once, then probe the
corpus against the BITMAP — whose size depends only on the chosen
false-positive rate, never on the eval set's row count or string bytes.

Spark-first construction, no UDFs anywhere:

- ``k`` bit positions per key via ``xxhash64(key, i)`` (seeding by
  hashing the pair — Spark's xxhash64 has a fixed seed), ``pmod`` into
  ``m_bits``;
- the bit array lives as a (word_idx BIGINT, bits BIGINT) DataFrame:
  positions → (word, 1<<bit) → ``bit_or`` groupBy — one narrow shuffle
  of the EVAL side only, at most m_bits/64 result rows (1 M bits = 16 K
  rows ≈ 250 KB — broadcastable at any eval-set size);
- probing joins the corpus's (key, word_idx) pairs to the broadcast
  word table and demands all ``k`` probed bits set — k-fold row fan-out
  of narrow (id, word) rows, a broadcast hash join, and one partial
  aggregation; the corpus is never collected, shuffled wide, or
  self-joined.

Semantics (inherent to the sketch): NO false negatives — a key that was
inserted always probes true; false positives at the standard
``(1 - e^(-k·n/m))^k`` rate drop extra corpus rows.  For
decontamination that errs on the safe side (over-dropping), which is
the accepted trade in large-scale pipeline practice.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = [
    "bloom_build",
    "bloom_probe",
    "bloom_contaminated_ids",
    "bloom_decontaminate",
]


def _positions(key: F.Column, m_bits: int, k: int) -> list[F.Column]:
    """k bit positions in [0, m_bits) for a key expression."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int, k: int = 10
) -> DataFrame:
    """Aggregate ``keys[key_col]`` into a Bloom word table
    (word_idx BIGINT, bits BIGINT) — ≤ m_bits/64 rows regardless of
    input size.  ``m_bits`` should be a multiple of 64; pick
    ``m_bits ≈ 20 × n`` with ``k=10`` for ~1e-4 FP
    ((1 − e^(−k·n/m))^k ≈ 0.39^10 ≈ 9e-5; the public optimum
    k = (m/n)·ln 2 ≈ 14 buys little more at this m/n)."""
    if m_bits % 64 != 0:
        raise ValueError(f"m_bits={m_bits} must be a multiple of 64")
    # explode_outer per the Generate invariant (CLAUDE.md): plain
    # explode would get an inferred size>0 pre-filter that re-evaluates
    # the k-hash array per row; the array is total (never null/empty)
    # so outer semantics are identical.
    pos = F.explode_outer(F.array(*_positions(F.col(key_col), m_bits, k)))
    return (
        keys.select(pos.alias("_pos"))
        .select(
            (F.col("_pos") / 64).cast("bigint").alias("word_idx"),
            # shiftleft with a COLUMN shift amount needs the SQL form
            # (the PySpark wrapper only accepts a literal int)
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))"
            ).alias("_bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_bit").alias("bits"))
    )


def _probe_exploded(df: DataFrame, key_col: str, m_bits: int, k: int) -> DataFrame:
    """k probe rows per input row: ``word_idx`` + ``_bit`` mask for each
    of the key's k positions — the shared front half of every probe
    (explode_outer per the Generate invariant: the position array is
    total)."""
    return (
        df.withColumn(
            "_pos",
            F.explode_outer(F.array(*_positions(F.col(key_col), m_bits, k))),
        )
        .withColumn("word_idx", (F.col("_pos") / 64).cast("bigint"))
        .withColumn(
            "_bit",
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))"),
        )
    )


def _hit() -> F.Column:
    """Bit test shared by every probe consumer: an absent word row
    (left-join miss) is an unset bit.  (A function, not a module
    constant: building a Column needs an active SparkContext.)"""
    return F.col("bits").isNotNull() & (
        F.col("bits").bitwiseAND(F.col("_bit")) != 0
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    words: DataFrame,
    m_bits: int,
    k: int = 10,
    result_col: str = "maybe_member",
) -> DataFrame:
    """``df`` + a boolean ``result_col``: True iff all k probed bits are
    set (key *possibly* inserted; False is definitive absence).

    Plan shape: explode of the k positions (k-fold fan-out), LEFT
    broadcast join to the word table (an absent word row is an unset
    bit), then a partial-agg AND back to one row per input row.  A
    transient ``_probe_id`` keys the regroup and the original columns
    ride through as ``first()`` — probe NARROW frames (id + key): every
    carried column travels the k-fold fan-out and one shuffle.
    """
    probes = _probe_exploded(
        df.withColumn("_probe_id", F.monotonically_increasing_id()),
        key_col,
        m_bits,
        k,
    )
    joined = probes.join(F.broadcast(words), "word_idx", "left").select(
        "_probe_id", *df.columns, _hit().alias("_hit")
    )
    return (
        joined.groupBy("_probe_id")
        .agg(
            *[F.first(c).alias(c) for c in df.columns],
            F.min(F.col("_hit").cast("int")).alias("_all_hit"),
        )
        .select(*df.columns, (F.col("_all_hit") == 1).alias(result_col))
    )


def bloom_decontaminate(
    corpus: DataFrame,
    eval_shingles: DataFrame,
    corpus_shingles: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "s",
    m_bits: int | None = None,
    k: int = 10,
    n_eval_hint: int | None = None,
) -> DataFrame:
    """Drop corpus docs sharing any shingle with the eval set, using a
    Bloom filter over the EVAL shingles instead of broadcasting them.

    ``eval_shingles`` / ``corpus_shingles``: (id, shingle-hash) frames —
    the same shape ``functions.text.shingle_hashes`` explodes produce.
    ``m_bits`` defaults to 20 bits per eval shingle (``n_eval_hint`` or
    a counted upper bound) → ~1e-4 FP.  Guarantee: every exactly-
    contaminated doc is dropped (no false negatives); ~FP-rate extra
    docs are over-dropped.  Use the exact broadcast path when the eval
    set is small; this path when it is not — the word table stays
    ≤ m_bits/64 rows either way.
    """
    if m_bits is None:
        n = n_eval_hint if n_eval_hint is not None else eval_shingles.count()
        m_bits = max(64, ((20 * max(n, 1) + 63) // 64) * 64)
    contaminated = bloom_contaminated_ids(
        eval_shingles, corpus_shingles, id_col, shingle_col, m_bits, k
    )
    return corpus.join(contaminated, id_col, "left_anti")


def bloom_contaminated_ids(
    eval_shingles: DataFrame,
    corpus_shingles: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "s",
    m_bits: int = 1 << 20,
    k: int = 10,
) -> DataFrame:
    """Distinct corpus ids with ≥1 shingle possibly in the eval set —
    the lazy building block behind :func:`bloom_decontaminate` (and
    ``pipeline.curate``'s observed decontam stage).

    Grouping runs on the DETERMINISTIC (doc, shingle) key — no
    transient probe ids; duplicate shingles within a doc merge
    harmlessly before the doc-level distinct.
    """
    words = bloom_build(eval_shingles, shingle_col, m_bits, k)
    probes = _probe_exploded(
        corpus_shingles.select(id_col, shingle_col), shingle_col, m_bits, k
    )
    hit = _hit().cast("int")
    return (
        probes.join(F.broadcast(words), "word_idx", "left")
        .groupBy(id_col, shingle_col)
        .agg(F.min(hit).alias("_all_hit"))
        .filter(F.col("_all_hit") == 1)
        .select(id_col)
        .distinct()
    )
