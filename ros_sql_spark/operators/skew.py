"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting (enabled engine-wide in session.py) handles
most skew at runtime; these are the explicit fallbacks for the cases AQE
can't fix:

- ``salted_aggregate``: two-phase aggregation for decomposable aggregates
  (sum/count/min/max) when ONE grouping key dominates — phase 1 groups on
  (keys, salt) spreading the hot key over ``buckets`` reducers, phase 2
  merges the partials.  For ordinary distributions Spark's own partial
  aggregation already does this; use it when a single key is so hot that
  even the final aggregation of one key's rows saturates one task — at
  100 TB that's a real failure mode (e.g. one user with 10% of events).
- ``salted_broadcast_left_join``: replicate a SMALL right side ``buckets``
  times and salt the left randomly — an explicit alternative when the
  right side is broadcastable but the left's hot key would overload one
  task in a shuffle join.

Deterministic salting: salt = pmod(xxhash64(salt_src), buckets) with a
caller-chosen high-cardinality column, so plans stay reproducible (no
rand()).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "salted_aggregate",
    "salted_broadcast_left_join",
    "detect_hot_keys",
    "split_skew_join",
]

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_src: str,
    buckets: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: out_col -> (fn, in_col) with fn in sum|count|min|max
    (decomposable aggregates only — avg must be derived as sum/count by
    the caller).  ``("count", "*")`` is COUNT(*) (row count);
    ``("count", col)`` is COUNT(col) (non-null count) — both identical
    to the corresponding plain ``groupBy().agg(...)``.  ``salt_src``: a high-cardinality column that varies
    WITHIN each key group (a row id / timestamp — NOT the group key:
    a salt that is a function of the key leaves the hot key in one
    bucket).

    Result is identical to ``df.groupBy(keys).agg(...)`` — asserted in
    tests — but the heaviest key's rows spread across ``buckets`` tasks
    in phase 1.
    """
    if salt_src in keys:
        raise ValueError(
            "salt_src must differ from the grouping keys: a salt that is "
            "a function of the key cannot spread the key's rows"
        )
    salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(buckets)).alias("_salt")
    phase1_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            # "*" -> COUNT(*); a column name -> COUNT(col) (non-null).
            expr = F.count(F.lit(1)) if col == "*" else F.count(col)
        else:
            expr = getattr(F, fn)(col)
        phase1_exprs.append(expr.alias(f"_p_{out}"))
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*phase1_exprs)
    final_exprs = [
        _MERGE[fn](f"_p_{out}").alias(out) for out, (fn, _) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_broadcast_left_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_src: str,
    buckets: int = 8,
) -> DataFrame:
    """Inner join where the hot-keyed LEFT is salted and the small RIGHT
    is replicated ``buckets``× then broadcast.  Same rows as
    ``left.join(right, key)``; the hot key fans out over ``buckets``
    tasks instead of one.

    ``salt_src`` must vary WITHIN a key group (a row id, a timestamp) —
    salting by a hash of the key itself would put every row of the hot
    key in the same bucket and change nothing.
    """
    if salt_src == key:
        raise ValueError(
            "salt_src must differ from the join key: a salt that is a "
            "function of the key cannot spread the key's rows"
        )
    salted_left = left.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(buckets))
    )
    replicated = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = salted_left.join(F.broadcast(replicated), [key, "_salt"])
    return out.drop("_salt")


def detect_hot_keys(
    df: DataFrame,
    key: str,
    sample_fraction: float = 0.01,
    min_sampled_rows: int = 100,
    seed: int = 42,
) -> list:
    """Hot-key census on a seeded SAMPLE: key values whose sampled row
    count exceeds ``min_sampled_rows`` (≈ min_sampled_rows /
    sample_fraction true rows).  The aggregation runs over the sample
    only and just the hot list (O(10⁰–10²) values) reaches the driver —
    control-plane cost, valid at any corpus size.  Sampling misses keys
    near the threshold; that is fine — a missed warm key falls to the
    cold path, which still handles it correctly (just less spread out).
    """
    rows = (
        df.sample(fraction=sample_fraction, seed=seed)
        .groupBy(key)
        .count()
        .filter(F.col("count") >= min_sampled_rows)
        .select(key)
        .collect()
    )
    return [r[0] for r in rows]


def split_skew_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot_keys: list,
    buckets: int = 16,
    salt_src: Column | str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Big-big equi-join with explicit hot-key splitting ("differentiated
    join"): rows of ``hot_keys`` go through a salted shuffle join (the
    left's hot rows spread over ``buckets`` composite-key partitions,
    the right's hot rows replicated ``buckets``×); all other keys take
    the ordinary equi-join.  The union is row-identical to
    ``left.join(right, key, how)`` (asserted in tests).

    When to use over AQE's skew-join splitting: AQE can only split a
    skewed SHUFFLE PARTITION of a SortMergeJoin after the map stage
    materializes it, cannot help when the skewed side arrives
    pre-partitioned (bucketed tables — no exchange to split), and reacts
    per-query; this operator bakes the split into the plan, composes
    with any join strategy, and replicates only the hot keys' right rows
    (a whole-join salt would multiply ALL of the right's shuffle bytes
    by ``buckets``).

    ``salt_src``: column/expression varying WITHIN a key group on the
    left (row id, timestamp).  Default: xxhash64 over all left columns —
    deterministic, and identical rows landing in one bucket is
    harmless.  ``how``: "inner" or "left" (each left row exists exactly
    once on exactly one salt, so left-outer null-extension survives the
    split; right/full outer would need null-extension across the split
    boundary — unsupported).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r}: only inner/left survive the split")
    if not hot_keys:
        return left.join(right, key, how)
    if salt_src is None:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(buckets)
        )
    else:
        src = F.col(salt_src) if isinstance(salt_src, str) else salt_src
        salt = F.pmod(F.xxhash64(src), F.lit(buckets))

    is_hot = F.col(key).isin(hot_keys)
    # NULL keys: isin() yields NULL, which both `is_hot` and `~is_hot`
    # filters would drop — but a left join must null-extend null-key
    # left rows.  They can never equi-match, so route them cold.
    cold_side = ~is_hot | F.col(key).isNull()
    # cold path: ordinary equi-join (AQE/bucketing/broadcast all still
    # apply — the split is invisible to strategy choice)
    cold = left.filter(cold_side).join(right.filter(cold_side), key, how)

    hot_left = left.filter(is_hot).withColumn("_salt", salt)
    hot_right = (
        right.filter(is_hot)
        .withColumn("_s", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
        .withColumn("_salt", F.col("_s").cast("bigint"))
        .drop("_s")
    )
    hot = hot_left.join(hot_right, [key, "_salt"], how).drop("_salt")
    return cold.unionByName(hot)
