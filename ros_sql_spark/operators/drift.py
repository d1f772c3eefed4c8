"""Drift detection: the scaled CUSUM change-point statistic as a
reusable operator — batch (plans/queries.py::qx62_changepoint) and the
continuous monitor (streaming/drift.py) share THIS arithmetic, so the
stream-equals-batch equivalence is structural.

S'_t = n·C_t − t·T over the daily series (C_t = inclusive cumulative
sum through day t, T = total, t = day rank, n = #days) — the classic
Σ(xᵢ − x̄) CUSUM scaled by n: identical argmax, but every quantity
stays EXACT (bigint·decimal products; no mean, no division), so
cross-engine and cross-pipeline parity is never a rounding accident.

Rank and cumulative both come from operators/ordered.py's bucketed
decompositions (day-range buckets, ``day div 8``): even on the
calendar-bounded daily frame the suite-wide no-SinglePartition rule
stays mechanical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ros_sql_spark.operators.ordered import (
    bucketed_row_number,
    bucketed_running_sum,
)

__all__ = ["cusum_scores"]


def cusum_scores(
    daily: DataFrame, day_col: str = "day", value_col: str = "_x"
) -> DataFrame:
    """(day, cusum, score) for every day of the (calendar-bounded)
    ``daily`` frame — cusum = S'_t cast to double (exact: the decimal
    magnitude is far under 2⁵³), score = |S'_t|.  The caller orders /
    limits (batch: TakeOrdered top-k; monitor: same).  ``daily`` is
    consumed by three differing projections (the (n, T) scalar, the
    rank counts, the cumulative path) — pin it upstream."""
    nt = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(value_col).alias("_tt"),
    )
    binned = daily.withColumn(
        "_bkt", F.expr(f"{day_col} div 8").cast("int")
    )
    ranked = bucketed_row_number(binned, "_bkt", [day_col], out="_t")
    cum = bucketed_running_sum(
        ranked, "_bkt", [day_col], value_col, out="_c"
    )
    s = cum.crossJoin(F.broadcast(nt)).select(
        day_col,
        (
            F.col("_n") * F.col("_c") - F.col("_t") * F.col("_tt")
        ).alias("_s"),
    )
    return s.select(
        day_col,
        F.col("_s").cast("double").alias("cusum"),
        F.abs(F.col("_s")).cast("double").alias("score"),
    )
