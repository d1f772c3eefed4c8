"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_scan_parallelism"]


def ensure_scan_parallelism(df: DataFrame) -> DataFrame:
    """Repartition iff the input scan has fewer files than cores.

    Single-row-group parquet tables (like the 500-row documents/
    embeddings test tables) plan as ONE task, serializing any
    expression-heavy projection onto one core.  At production scale the
    input already has >= cores files and this is a no-op.

    The probe is ``inputFiles()`` — plan inspection only, zero jobs,
    AQE or not — so the helper is safe on MID-PIPELINE frames (e.g.
    inside ``curate()``).  The eager twin this replaced probed
    ``df.rdd.getNumPartitions()``, which MATERIALIZES upstream query
    stages under AQE (measured: one real job per probe on a
    post-shuffle frame); it is gone so the hazard class cannot recur.
    With at-least-cores input files the probe is a no-op, and a
    post-shuffle frame over few files costs at most one tiny extra
    shuffle — never an eager job.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df  # non-file-backed plan: nothing to guard
    if 0 < n_files < target:
        return df.repartition(target)
    return df
