"""Exact interpolated percentiles with BOUNDED task memory.

Spark's ``percentile()`` aggregate (SURVEY.md §2.2 'ordered-set
aggregates') buffers EVERY value of a group inside one aggregation
buffer — a counts map that lives on the heap of a single task.  With a
handful of groups over a 100 TB corpus that is one language's full
value multiset in one JVM: correct at parity scale, an OOM at 100×.
``approx_percentile`` (q45) is the sketch answer; this module is the
EXACT answer at scale — the classic rank-based two-phase selection:

1. pre-aggregate to ``(group, value, count)`` — hash aggregation with
   map-side partial combine; the frame shrinks from rows to DISTINCT
   values per group;
2. one window over that frame (partitioned by group, ordered by value)
   assigns each distinct value its cumulative rank range
   ``(cum - c, cum]`` and the group total ``n`` — Spark's window sort
   and unbounded frame both stream through spillable buffers
   (UnsafeExternalSorter / ExternalAppendOnlyUnsafeRowArray), so task
   memory stays bounded however large one group is;
3. the value(s) straddling each target rank are selected with a
   constant-width predicate and ONE final hash aggregation per group
   interpolates — identical arithmetic to the engines' own continuous
   quantile (pos = p·(n−1), linear interpolation between the two
   straddled order statistics).

NULL handling matches ``percentile()``: NULL values are ignored.  (A
group whose values are ALL null disappears from the output by default
instead of yielding a NULL percentile — ``keep_null_groups=True``
outer-joins the group list back for drop-in ``percentile()``
row-semantics.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

__all__ = ["exact_percentiles"]


def exact_percentiles(
    df: DataFrame,
    keys: list[str],
    col: str,
    ps: dict[str, float],
    keep_null_groups: bool = False,
) -> DataFrame:
    """One row per group: ``keys`` + one DOUBLE column per ``ps`` entry
    (name -> fraction in [0, 1]), each the exact linearly-interpolated
    percentile of ``col`` — same result as
    ``F.expr(f"percentile({col}, p)")`` (asserted in tests) with
    rank-selection instead of a value-buffering aggregate.

    By default a group whose values are ALL null disappears (the
    NULL-filter happens before grouping).  ``keep_null_groups=True``
    restores ``percentile()``'s drop-in semantics — such groups come
    back with NULL percentiles, via one extra left join from the
    distinct group list (a second scan of ``df``'s group columns;
    callers that don't need the rows shouldn't pay it — round-7
    ADVICE)."""
    for name, p in ps.items():
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"{name}: percentile {p} outside [0, 1]")

    cnts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(*keys, col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = cnts.select(
        *keys,
        F.col(col).cast("double").alias("_v"),
        F.col("_c"),
        F.sum("_c").over(w_cum).alias("_cum"),
        F.sum("_c").over(w_all).alias("_n"),
    )

    # per-percentile straddle columns: a distinct value covers 1-indexed
    # ranks (cum - c, cum]; the target order statistics for fraction p
    # are ranks k+1 and k+2 with k = floor(p·(n−1)) — the same double
    # arithmetic the engines' own continuous quantiles use.
    sel_cols = []
    agg_exprs = []
    out_exprs = list(keys)
    for name, p in ps.items():
        pos = F.lit(float(p)) * (F.col("_n") - F.lit(1)).cast("double")
        k = F.floor(pos)
        covers = lambda r: (F.col("_cum") >= r) & (F.col("_cum") - F.col("_c") < r)  # noqa: E731
        sel_cols.extend(
            [
                F.when(covers(k + 1), F.col("_v")).alias(f"_lo_{name}"),
                F.when(covers(k + 2), F.col("_v")).alias(f"_hi_{name}"),
                (pos - k.cast("double")).alias(f"_frac_{name}"),
            ]
        )
        agg_exprs.extend(
            [
                F.max(f"_lo_{name}").alias(f"_lo_{name}"),
                F.max(f"_hi_{name}").alias(f"_hi_{name}"),
                F.max(f"_frac_{name}").alias(f"_frac_{name}"),
            ]
        )
        lo, hi, frac = (
            F.col(f"_lo_{name}"),
            F.col(f"_hi_{name}"),
            F.col(f"_frac_{name}"),
        )
        # BIT-IDENTICAL interpolation to Spark's Percentile aggregate:
        # (higher - pos)·lo + (pos - lower)·hi, with the frac==0 branch
        # returning lo directly — NOT the algebraically-equal lerp
        # lo + frac·(hi - lo), which differs in the last ulp.
        out_exprs.append(
            F.when(frac == F.lit(0.0), lo)
            .otherwise((F.lit(1.0) - frac) * lo + frac * hi)
            .alias(name)
        )

    out = (
        ranked.select(*keys, *sel_cols)
        .groupBy(*keys)
        .agg(*agg_exprs)
        .select(*out_exprs)
    )
    if keep_null_groups:
        # eqNullSafe, NOT on=keys: a NULL group KEY is a real group
        # (groupBy treats NULL as a grouping value) and a null-unsafe
        # restore join would drop its computed percentiles — the row
        # would come back (NULL, NULL) even when its values aggregated
        # fine (round-8 review finding).
        groups = df.select(*keys).distinct()
        cond = None
        for k in keys:
            c = groups[k].eqNullSafe(out[k])
            cond = c if cond is None else (cond & c)
        out = groups.join(out, cond, "left").select(
            *[groups[k] for k in keys],
            *[out[c] for c in out.columns if c not in keys],
        )
    return out
