"""Grid-bucketed SPATIAL operators (round-13): the scale-safe pattern
for distance predicates — candidate generation by coarse grid cell,
exact verification on the candidates — i.e. the banded-LSH/PPJoin
discipline (operators/dedup.py) applied to 2-D geometry.

Why a grid: a radius join's naive form is the all-pairs cross join
(the suite-wide plan test bans CartesianProduct for a reason).  With
cell size = radius, every true neighbor pair lands in the SAME cell or
one of its 8 neighbors, so expanding ONE side to its 3×3 cell
neighborhood and equi-joining on the cell key is a COMPLETE candidate
generator (proof: |Δx| ≤ r ⇒ the cells' x indices differ by ≤ 1, same
for y), and the join is an ordinary shuffled/broadcast equi-join the
optimizer can place.  Cost: 9× row expansion of the expanded side +
candidates ≈ points-per-cell-neighborhood per probe — at 100 TB the
shuffle keys are cell ids, distance math never leaves the matched
cell pairs.

Exactness: integer coordinates, squared-distance comparison (d² ≤ r²)
— no floats anywhere, so a SQL oracle reproduces every pair
bit-for-bit (qx68 verifies the generator's COMPLETENESS against a
naive all-pairs oracle).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["grid_radius_join"]


def grid_radius_join(
    probe: DataFrame,
    base: DataFrame,
    radius: int,
    probe_cols: tuple[str, str, str] = ("p_id", "px", "py"),
    base_cols: tuple[str, str, str] = ("b_id", "bx", "by"),
) -> DataFrame:
    """All (probe, base) pairs with squared Euclidean distance
    ≤ radius²: returns the probe/base id + coordinate columns plus
    ``d2``.  ``probe`` is the side expanded ×9 (its points are hashed
    to their 3×3 cell neighborhood) — pass the SMALLER side as
    ``probe``; ``base`` maps 1:1 to its own cell.  Coordinates must be
    NON-NEGATIVE integers (integer `div` truncation == floor only
    there; shift first if your domain is signed).  Column names must
    be disjoint between the two frames."""
    pid, px, py = probe_cols
    bid, bx, by = base_cols
    r = int(radius)
    if r <= 0:
        # div 0 would NULL every cell key and silently drop all pairs
        # (or raise mid-job under ANSI mode) — round-13 review
        raise ValueError(f"radius must be a positive integer, got {radius}")
    cells = F.array(
        *[
            F.struct(
                (F.expr(f"{px} div {r}") + F.lit(dx)).alias("_cx"),
                (F.expr(f"{py} div {r}") + F.lit(dy)).alias("_cy"),
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    # bare explode of a cheap literal-offset array — the
    # InferFiltersFromGenerate hazard is about EXPENSIVE exprs
    probes = probe.select(
        pid, px, py, F.explode(cells).alias("_c")
    ).select(pid, px, py, F.col("_c._cx").alias("_cx"), F.col("_c._cy").alias("_cy"))
    bases = base.select(
        bid,
        bx,
        by,
        F.expr(f"{bx} div {r}").alias("_cx"),
        F.expr(f"{by} div {r}").alias("_cy"),
    )
    dx = F.col(px) - F.col(bx)
    dy = F.col(py) - F.col(by)
    return (
        probes.join(bases, ["_cx", "_cy"])
        .withColumn("d2", dx * dx + dy * dy)
        .filter(F.col("d2") <= F.lit(r * r))
        .drop("_cx", "_cy")
    )
