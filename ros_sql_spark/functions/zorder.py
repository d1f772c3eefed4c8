"""Z-order (Morton) clustering keys — multi-column data skipping.

Linear clustering (``snapshot_compact(cluster_by=["x"])``) gives each
file a tight ``x`` range but leaves ``y`` spanning everything: a
``y``-range read prunes nothing.  Interleaving the BITS of both
columns' bucket numbers (Morton order — public technique, used by
Delta OPTIMIZE ZORDER and Databricks/Iceberg docs) makes file ranges
tight in EVERY interleaved dimension at once, at the cost of each
being ~sqrt as tight as a dedicated linear sort.

Spark-first: the key is a single static-unrolled JVM expression
(shiftleft / shiftright / bitwiseAND / bitwiseOR over the bucketed
columns — ``bits × n_cols`` terms, whole-stage-codegen'd; no UDF), so
``repartitionByRange(key) + sortWithinPartitions(key)`` is an ordinary
shuffle+sort.  Bucketing needs each column's [lo, hi] — one tiny
aggregate the caller (or :func:`zorder_bounds`) computes; values
outside the bounds clamp into the edge buckets (correctness never
depends on the bounds, only skipping quality).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = ["zorder_key", "zorder_bounds"]


def zorder_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple]:
    """[lo, hi] per column from one aggregate — 2·|cols| scalars to the
    driver (control-plane, same class as a codebook)."""
    row = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).collect()[0]
    return {c: (row[f"_lo_{c}"], row[f"_hi_{c}"]) for c in cols}


def zorder_key(bounds: dict[str, tuple], bits: int = 8) -> Column:
    """BIGINT Morton key interleaving ``bits`` bucket bits per column.

    Buckets are ``floor((col - lo) * 2^bits / (hi - lo + 1))`` clamped
    to [0, 2^bits) — exact integer arithmetic for integer columns (the
    intended use; the +1 keeps hi inside the last bucket).  Bit i of
    column j lands at output bit ``i * n_cols + j``, so a range on ANY
    single column still maps to a bounded set of key intervals.
    ``bits × n_cols`` must stay ≤ 62 (BIGINT).
    """
    cols = list(bounds)
    n = len(cols)
    if bits * n > 62:
        raise ValueError(f"bits={bits} × {n} cols exceeds a BIGINT key")
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    buckets = []
    for c in cols:
        lo, hi = bounds[c]
        if lo is None or hi is None:
            raise ValueError(
                f"zorder_key: column {c!r} has no non-null values "
                "(empty input or all-NULL column) — nothing to bucket"
            )
        span = int(hi) - int(lo) + 1
        b = F.floor(
            (F.col(c).cast("bigint") - F.lit(int(lo)))
            * F.lit(1 << bits)
            / F.lit(span)
        ).cast("bigint")
        b = F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), b))
        buckets.append(b)
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key
