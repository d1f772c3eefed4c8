"""Property tests for operators/spatial.py: the 3×3-cell grid
candidate generator must equal the brute-force all-pairs radius join
on arbitrary non-negative integer points — boundary distances (d² ==
r² exactly), co-located points, cell-edge coordinates, radius 1."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from ros_sql_spark.operators.spatial import grid_radius_join

pytestmark = pytest.mark.slow  # ~1 Spark job per hypothesis example

pts = st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)),
               min_size=1, max_size=12)


@given(a=pts, b=pts, r=st.integers(1, 25))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_grid_radius_join_equals_bruteforce(spark, a, b, r):
    probe = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(a)], "p_id int, px int, py int"
    )
    base = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(b)], "b_id int, bx int, by int"
    )
    got = {
        (row["p_id"], row["b_id"], row["d2"])
        for row in grid_radius_join(probe, base, r).collect()
    }
    want = {
        (i, j, (ax - bx) ** 2 + (ay - by) ** 2)
        for i, (ax, ay) in enumerate(a)
        for j, (bx, by) in enumerate(b)
        if (ax - bx) ** 2 + (ay - by) ** 2 <= r * r
    }
    assert got == want


def test_grid_radius_join_rejects_nonpositive_radius(spark):
    """radius <= 0 would NULL every cell key (x div 0) and silently
    return zero pairs — a named error instead (round-13 review)."""
    df = spark.createDataFrame([(1, 0, 0)], "p_id int, px int, py int")
    db = spark.createDataFrame([(1, 0, 0)], "b_id int, bx int, by int")
    with pytest.raises(ValueError, match="radius"):
        grid_radius_join(df, db, 0)
