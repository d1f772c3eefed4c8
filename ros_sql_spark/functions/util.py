"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_parallelism", "ensure_scan_parallelism"]


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition iff the input has fewer partitions than cores.

    Single-row-group parquet tables (like the 500-row documents/
    embeddings test tables) plan as ONE task, serializing any
    expression-heavy projection onto one core.  At production scale the
    input already has >= cores partitions and this is a no-op; the guard
    costs one cheap plan inspection, the repartition (when it fires) one
    tiny shuffle.

    EAGERNESS caveat: the ``df.rdd`` probe MATERIALIZES upstream query
    stages under AQE (measured: one real job per probe on a
    post-shuffle frame), so this form is only for operators whose input
    is a direct scan.  Operators that may sit mid-pipeline (downstream
    of other lazy stages — e.g. inside ``curate()``) must use
    :func:`ensure_scan_parallelism`, whose probe is plan-only.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def ensure_scan_parallelism(df: DataFrame) -> DataFrame:
    """Lazy twin of :func:`ensure_parallelism`: probes ``inputFiles()``
    (plan inspection only — zero jobs, AQE or not) instead of the
    RDD's partition count.  Fires on the same hazard (a few-file scan
    serializing an expression-heavy map phase) while leaving frames
    already downstream of an exchange alone: with at-least-cores input
    files the probe is a no-op, and a post-shuffle frame over few
    files costs at most one tiny extra shuffle — never an eager job.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df  # non-file-backed plan: nothing to guard
    if 0 < n_files < target:
        return df.repartition(target)
    return df
