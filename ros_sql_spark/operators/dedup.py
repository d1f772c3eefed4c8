"""Deduplication operators for LLM-scale corpora.

The reference (strawlab/ros_sql) has no dedup — these are the
training-data-pipeline extensions the engine adds (SURVEY.md §2.3
q25/q26; driver north star).

Design for 100 TB:
- Everything is built-in Spark SQL expressions (xxhash64, higher-order
  array functions) — JVM execution, zero Python in the hot path.
- Signature computation is SHUFFLE-FREE: each doc's 64-dim MinHash is a
  single aggregate fold over the shingle-hash array (one projection, no
  explode, no groupBy) — embarrassingly parallel per partition, so it
  scales linearly with executors.
- Duplicate shingles are NOT deduplicated first: min() is insensitive to
  multiplicity, so the distinct-shuffle would be pure waste.
- Tokens are materialized as a column before windowing; inlining the
  split inside the shingle lambda makes Spark re-evaluate it per
  element_at — O(tokens²) per document (measured 17s → <1s at sf0.1).
- LSH banding turns the quadratic all-pairs problem into an equi-join on
  (band, band_hash); hot buckets (boilerplate) are the classic skew case,
  handled by AQE skew-join splitting plus the ``max_bucket_size`` guard.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "exact_dedup",
    "tokenize",
    "token_shingles",
    "minhash_signatures",
    "minhash_bands",
    "minhash_pairs",
    "ngram_jaccard_pairs",
]

DEFAULT_NUM_HASHES = 64
DEFAULT_BANDS = 16  # 16 bands × 4 rows: s-curve threshold ≈ (1/16)^(1/4) ≈ 0.5


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Keep the lowest-id row per exact content hash (q25 semantics).

    One shuffle on a 128-bit content digest; grouping on the digest (not
    the content) keeps shuffle rows narrow at scale.
    """
    h = F.md5(F.col(content_col).cast("binary"))
    return (
        df.groupBy(h.alias("content_hash"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


def tokenize(text_col: str | Column) -> Column:
    """Lowercased whitespace tokens."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.lower(c), " ")


def token_shingles(tokens_col: str | Column, k: int = 3) -> Column:
    """k-token shingles from a MATERIALIZED tokens array column.

    Pass a column *reference* (not an inline split expression): lambda
    bodies re-evaluate captured expressions per element, which turns an
    inlined tokenizer into O(tokens²) work per document.

    Documents shorter than k tokens contribute their joined text as a
    single shingle so they still participate in dedup.
    """
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    n = F.size(toks)
    windowed = F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + F.lit(j + 1)).cast("int")) for j in range(k)]
        ),
    )
    return F.when(n >= k, windowed).otherwise(F.array(F.concat_ws(" ", toks)))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    k: int = 3,
) -> DataFrame:
    """(id, sig: array<bigint>) — one MinHash signature per document.

    Each shingle string is hashed ONCE (xxhash64); the i-th family is then
    xxhash64(i, h) over the fixed-width long — 64 cheap long-pair hashes
    instead of 64 string hashes per shingle.

    The signature is a single left fold (F.aggregate) over the shingle-hash
    array: acc starts as 64× Long.MaxValue and every shingle updates all 64
    minima in one zip_with pass.  Structuring it as "64 × array_min over
    the shingles" instead is a 64× performance bug: Catalyst's
    CollapseProject inlines the (once-referenced) shingle pipeline into
    the per-i lambda, re-evaluating tokenize+shingle+hash per dimension
    (verified in the optimized plan; 25s → <1s at sf0.1).

    Zero mandatory shuffles — a pure projection.  Small inputs (fewer
    partitions than cores, e.g. a single parquet row-group) are
    repartitioned so the projection actually parallelizes; at production
    scale the input already has >cores partitions and this is a no-op.
    """
    from ros_sql_spark.functions.util import ensure_parallelism

    df = ensure_parallelism(df)
    long_max = F.lit(9223372036854775807).cast("bigint")
    dims = F.sequence(F.lit(0), F.lit(num_hashes - 1))  # constant-folded
    return (
        df.select(F.col(id_col), tokenize(text_col).alias("_toks"))
        .select(F.col(id_col), token_shingles("_toks", k).alias("_sh"))
        .select(
            F.col(id_col),
            F.aggregate(
                F.transform("_sh", lambda s: F.xxhash64(s)),
                F.array_repeat(long_max, num_hashes),
                lambda acc, h: F.zip_with(
                    acc, dims, lambda a, i: F.least(a, F.xxhash64(i, h))
                ),
            ).alias("sig"),
        )
    )


def minhash_bands(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    k: int = 3,
) -> DataFrame:
    """(id, band, band_hash) — LSH bucket keys, ``bands`` rows per doc.

    Docs sharing (band, band_hash) are near-dup candidates.  Deterministic
    (xxhash64 is seed-fixed), so testable without an oracle.
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, k)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.element_at("sig", b * rows + j + 1) for j in range(rows)]
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    return sigs.select(
        id_col, F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash"))


def minhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    k: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b, jaccard_est).

    Pipeline: band buckets → within-bucket self-join (skew-guarded by
    dropping degenerate buckets larger than ``max_bucket_size``) →
    distinct pairs → signature-agreement estimate of Jaccard via
    zip_with/aggregate → threshold filter.
    """
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, k).cache()
    rows = num_hashes // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.element_at("sig", b * rows + j + 1) for j in range(rows)]
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    b = sigs.select(id_col, F.explode(F.array(*band_cols)).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash")
    )
    bucket_sizes = b.groupBy("band", "band_hash").agg(F.count("*").alias("_bsz"))
    b = b.join(
        F.broadcast(bucket_sizes.filter(F.col("_bsz") > max_bucket_size)),
        ["band", "band_hash"],
        "left_anti",
    )
    left = b.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    right = b.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    cand = (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    matches = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    est = matches.cast("double") / F.lit(float(num_hashes))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(est, 6).alias("jaccard_est"))
        .filter(F.col("jaccard_est") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.1,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard for all pairs sharing ≥1 shingle — the
    scalable formulation (vs the quadratic cross-join in q32, which is
    only viable on small subsets).

    Pipeline: distinct (id, shingle) → self-join ON SHINGLE (each
    co-occurring shingle contributes one match row) → count = |A∩B| →
    join per-doc sizes → J = i / (|A| + |B| - i).  Cost is Σ df(s)² over
    shingles instead of N²: boilerplate shingles dominate, so
    ``max_doc_freq`` drops shingles appearing in more than that many
    docs (a stop-shingle both engines of any dedup pipeline prune; they
    carry ~zero discriminative signal and all of the skew).

    Pairs with zero shared shingles (J=0) are never materialized —
    equivalent to any threshold > 0.
    """
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(
                token_shingles(tokenize(F.col(text_col)), k)
            )
        ).alias("_sh"),
    )
    if max_doc_freq is not None:
        hot = (
            sh.groupBy("_sh")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_doc_freq)
            .select("_sh")
        )
        sh = sh.join(F.broadcast(hot), "_sh", "left_anti")
    sizes = sh.groupBy("_id").agg(F.count("*").alias("_n"))
    a = sh.select(F.col("_id").alias("id_a"), "_sh")
    b = sh.select(F.col("_id").alias("id_b"), "_sh")
    inter = (
        a.join(b, "_sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_i"))
    )
    na = sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na"))
    nb = sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb"))
    jac = F.col("_i").cast("double") / (
        F.col("_na") + F.col("_nb") - F.col("_i")
    ).cast("double")
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
