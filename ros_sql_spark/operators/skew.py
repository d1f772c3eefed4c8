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

import math

import pyspark.sql.functions as F
import pyspark.sql.types as T
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
    max_keys: int = 256,
    min_sampled_fraction: float | None = None,
) -> list:
    """Hot-key census on a seeded SAMPLE: key values whose sampled row
    count exceeds the threshold.  The aggregation runs over the sample
    only and just the hot list reaches the driver — control-plane cost,
    valid at any corpus size.  Sampling misses keys near the threshold;
    that is fine — a missed warm key falls to the cold path, which
    still handles it correctly (just less spread out).

    The census is BOUNDED two ways (an unbounded hot list would grow
    with key cardinality at 100×, and everything downstream — the
    driver transfer, the salted path's replication factor — grows with
    it):

    - ``max_keys``: only the top-``max_keys`` keys by sampled count are
      returned (TakeOrdered plan — the driver never receives more;
      ties break on the key value so the census is deterministic).
      A key the cap drops was by construction cooler than every key
      kept, and it falls to the cold path, which is still correct.
    - ``min_sampled_fraction``: a RELATIVE threshold — a key is hot if
      it holds at least this fraction of the SAMPLED rows.  Unlike the
      absolute ``min_sampled_rows`` (kept for callers that know their
      per-key row economics), a relative threshold means "hot" scales
      with the data: at 100× rows the same fraction still singles out
      genuinely dominant keys instead of electing every key whose
      absolute count crossed a number sized for 1×.  When given, the
      effective threshold is max(absolute, ceil(fraction·sampled));
      the sampled total rides along in the census's own aggregation
      (rollup grand-total row), so the census stays ONE job.
    """
    if max_keys <= 0:
        raise ValueError(f"max_keys={max_keys}: the census must be bounded")
    sampled = df.sample(fraction=sample_fraction, seed=seed).select(key)
    if min_sampled_fraction is None:
        rows = (
            sampled.groupBy(key)
            .count()
            .filter(F.col("count") >= min_sampled_rows)
            .orderBy(F.col("count").desc(), F.col(key).asc_nulls_last())
            .limit(max_keys)
            .select(key)
            .collect()
        )
        return [r[0] for r in rows]
    # Relative threshold needs the sampled TOTAL — ride it along in the
    # same aggregation via rollup (the grand-total group), so the census
    # stays ONE job instead of count() + census.  grouping(key)=1 marks
    # the total row; ordering it first keeps the collect bounded at
    # max_keys+1 rows (TakeOrdered plan).
    top = (
        sampled.rollup(key)
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.grouping(key).alias("_g"),
        )
        .orderBy(
            F.col("_g").desc(),
            F.col("count").desc(),
            F.col(key).asc_nulls_last(),
        )
        .limit(max_keys + 1)
        .collect()
    )
    total = next((r["count"] for r in top if r["_g"] == 1), 0)
    threshold = max(
        min_sampled_rows, int(math.ceil(min_sampled_fraction * total))
    )
    return [r[key] for r in top if r["_g"] == 0 and r["count"] >= threshold]


def split_skew_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot_keys: list,
    buckets: int = 16,
    salt_src: Column | str | None = None,
    how: str = "inner",
    broadcast_membership_threshold: int = 1024,
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

    Hot-membership routing: up to ``broadcast_membership_threshold``
    keys, membership is an ``isin(<literal list>)`` filter — cheap,
    codegen'd, no extra plan nodes.  Past it, the literal loses: a
    plan-embedded lookup list is re-evaluated per row and bloats the
    serialized plan (the repo's measured F.lit-big-list lesson), and a
    many-hot-key corpus is exactly where skew splitting matters.  There
    the hot set becomes a broadcast LEFT SEMI (hot) / LEFT ANTI (cold)
    join — one tiny broadcast, hash-probe membership, same rows (anti
    keeps NULL keys, which matches the cold-side NULL routing below).
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

    if len(hot_keys) <= broadcast_membership_threshold:
        is_hot = F.col(key).isin(hot_keys)
        # NULL keys: isin() yields NULL, which both `is_hot` and
        # `~is_hot` filters would drop — but a left join must
        # null-extend null-key left rows.  They can never equi-match,
        # so route them cold.
        cold_side = ~is_hot | F.col(key).isNull()
        cold_left, cold_right = left.filter(cold_side), right.filter(cold_side)
        hot_left_src, hot_right_src = left.filter(is_hot), right.filter(is_hot)
    else:
        spark = left.sparkSession
        hot_df = spark.createDataFrame(
            [(k,) for k in hot_keys],
            T.StructType([T.StructField(key, left.schema[key].dataType)]),
        )
        # semi/anti joins partition the rows exactly like the literal
        # filters: a NULL key never equi-matches, so anti (cold) keeps
        # it and semi (hot) drops it.
        cold_left = left.join(F.broadcast(hot_df), key, "left_anti")
        cold_right = right.join(F.broadcast(hot_df), key, "left_anti")
        hot_left_src = left.join(F.broadcast(hot_df), key, "left_semi")
        hot_right_src = right.join(F.broadcast(hot_df), key, "left_semi")

    # cold path: ordinary equi-join (AQE/bucketing/broadcast all still
    # apply — the split is invisible to strategy choice)
    cold = cold_left.join(cold_right, key, how)

    hot_left = hot_left_src.withColumn("_salt", salt)
    hot_right = (
        hot_right_src
        .withColumn("_s", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
        .withColumn("_salt", F.col("_s").cast("bigint"))
        .drop("_s")
    )
    hot = hot_left.join(hot_right, [key, "_salt"], how).drop("_salt")
    return cold.unionByName(hot)
