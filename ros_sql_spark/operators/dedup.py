"""Deduplication operators for LLM-scale corpora.

The reference (strawlab/ros_sql) has no dedup — these are the
training-data-pipeline extensions the engine adds (SURVEY.md §2.3
q25/q26; driver north star).

Design for 100 TB:
- Everything is built-in Spark SQL expressions (xxhash64, groupBy-min,
  higher-order functions) — whole-stage-codegen'd JVM execution, zero
  Python in the hot path, no UDFs.
- MinHash avoids a 64× row blow-up: shingles are exploded ONCE and the 64
  hash dimensions are 64 aggregate expressions over that single pass
  (map-side partial min applies).
- LSH banding turns the quadratic all-pairs problem into an equi-join on
  (band, band_hash) — a plain shuffle join Catalyst can plan; hot buckets
  (boilerplate shingles) are the classic skew case, handled by AQE
  skew-join splitting plus the ``max_bucket_size`` guard.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "exact_dedup",
    "shingles",
    "minhash_signatures",
    "minhash_bands",
    "minhash_pairs",
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


def shingles(text_col: str | Column, k: int = 3) -> Column:
    """k-token shingles of a text column as an array<string>.

    Documents shorter than k tokens contribute their whole text as a
    single shingle (so they still participate in dedup).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(F.lower(c), " ")
    n = F.size(toks)
    windowed = F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + F.lit(j + 1)).cast("int")) for j in range(k)]
        ),
    )
    return F.when(n >= k, windowed).otherwise(F.array(F.lower(c)))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    k: int = 3,
) -> DataFrame:
    """(id, sig: array<bigint>) — one MinHash signature per document.

    The i-th dimension is min over shingles of xxhash64(i, shingle):
    64 independent deterministic hash families without explicit (a,b)
    permutations, all evaluated in one aggregation pass.
    """
    sh = (
        df.select(F.col(id_col), F.explode(shingles(text_col, k)).alias("shingle"))
        .dropDuplicates([id_col, "shingle"])
    )
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"_m{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy(id_col).agg(*mins)
    return agg.select(
        id_col, F.array(*[f"_m{i}" for i in range(num_hashes)]).alias("sig")
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
    b = minhash_bands(df, id_col, text_col, num_hashes, bands, k)
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
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, k)
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
