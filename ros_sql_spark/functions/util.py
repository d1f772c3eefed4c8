"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_parallelism"]


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition iff the input has fewer partitions than cores.

    Single-row-group parquet tables (like the 500-row documents/
    embeddings test tables) plan as ONE task, serializing any
    expression-heavy projection onto one core.  At production scale the
    input already has >= cores partitions and this is a no-op; the guard
    costs one cheap plan inspection, the repartition (when it fires) one
    tiny shuffle.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
