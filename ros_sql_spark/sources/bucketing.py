"""Bucketed-table layout for co-located (shuffle-free) joins.

At 100 TB the orders⋈lineitem class of join shuffles both fact tables on
every query.  Writing both sides bucketed by the join key
(``bucketBy(n, key).sortBy(key)``) makes Spark plan a SortMergeJoin with
ZERO Exchange on either side — the co-location is decided once at write
time and every subsequent join rides it.  This is the write-side
counterpart to AQE: AQE fixes a bad shuffle at runtime, bucketing
removes the shuffle entirely.

Bucket count guidance: pick so each bucket file lands ~128–512 MB at the
target scale, and keep it IDENTICAL on both join sides (mismatched
counts reintroduce a shuffle on one side).

Bucketed tables must live in the session catalog (parquet ``saveAsTable``
— file-based ``save()`` cannot record bucketing metadata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_table"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    num_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table."""
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, bucket_key)
    if sort:
        w = w.sortBy(bucket_key)
    w.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
