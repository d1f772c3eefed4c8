"""Property tests for operators/spatial.py: the 3×3-cell grid
candidate generator must equal the brute-force all-pairs radius join
on arbitrary non-negative integer points — boundary distances (d² ==
r² exactly), co-located points, cell-edge coordinates, radius 1."""

from __future__ import annotations

import pytest
from tests.conftest import TEST_FULL, prop_examples
from hypothesis import HealthCheck, given, settings, strategies as st

from ros_sql_spark.operators.spatial import grid_radius_join

pytestmark = pytest.mark.slow  # ~1 Spark job per hypothesis example

pts = st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)),
               min_size=1, max_size=12)


@given(a=pts, b=pts, r=st.integers(1, 25))
@settings(
    max_examples=prop_examples(15),
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


def _naive_knn(a, b, k):
    out = set()
    for i, (px, py) in enumerate(a):
        cands = sorted(
            ((px - bx) ** 2 + (py - by) ** 2, j) for j, (bx, by) in
            enumerate(b)
        )
        for rank, (d2, j) in enumerate(cands[:k], 1):
            out.add((i, rank, j, d2))
    return out


@given(a=pts, b=pts, k=st.integers(1, 6), g=st.integers(1, 30))
@settings(
    max_examples=prop_examples(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_grid_knn_join_equals_bruteforce(spark, a, b, k, g):
    """Round-14: the expanding-ring search must equal brute-force
    top-k under arbitrary geometry/cell-size combinations — k larger
    than the base, ties at equal d2 (broken by b_id), probes whose
    ring-1 neighborhood is empty, single-cell domains."""
    from ros_sql_spark.operators.spatial import grid_knn_join

    probe = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(a)],
        "p_id int, px int, py int",
    )
    base = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(b)],
        "b_id int, bx int, by int",
    )
    got = {
        (row["p_id"], row["rank"], row["b_id"], row["d2"])
        for row in grid_knn_join(probe, base, k, g).collect()
    }
    assert got == _naive_knn(a, b, k)


def test_grid_knn_join_multi_ring_sparse(spark):
    """Deterministic multi-ring regime (not left to hypothesis):
    far-apart sparse points force rings ≥ 2 for every probe, and the
    result must still be the exact brute-force top-k."""
    from ros_sql_spark.operators.spatial import grid_knn_join

    import random

    rng = random.Random(77)
    na, nb = (20, 30) if TEST_FULL else (10, 16)
    a = [(rng.randrange(5000), rng.randrange(5000)) for _ in range(na)]
    b = [(rng.randrange(5000), rng.randrange(5000)) for _ in range(nb)]
    probe = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(a)],
        "p_id int, px int, py int",
    )
    base = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(b)],
        "b_id int, bx int, by int",
    )
    got = {
        (row["p_id"], row["rank"], row["b_id"], row["d2"])
        for row in grid_knn_join(probe, base, 5, 200).collect()
    }
    assert got == _naive_knn(a, b, 5)


def test_grid_knn_join_guards(spark):
    from ros_sql_spark.operators.spatial import grid_knn_join

    df = spark.createDataFrame([(1, 0, 0)], "p_id int, px int, py int")
    db = spark.createDataFrame([(1, 0, 0)], "b_id int, bx int, by int")
    with pytest.raises(ValueError, match="cell"):
        grid_knn_join(df, db, 3, 0)
    with pytest.raises(ValueError, match="k"):
        grid_knn_join(df, db, 0, 10)
    far = spark.createDataFrame(
        [(1, 0, 0), (2, 10_000_000, 0)], "b_id int, bx int, by int"
    )
    with pytest.raises(ValueError, match="max_rings"):
        grid_knn_join(df, far, 1, 10)


@given(
    p=pts,
    b=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40),
                  st.integers(0, 15), st.integers(0, 15)),
        min_size=1, max_size=10,
    ),
    g=st.integers(1, 25),
)
@settings(
    max_examples=prop_examples(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_grid_bbox_join_equals_bruteforce(spark, p, b, g):
    """Round-14: box rasterization must equal the brute-force BETWEEN
    join under arbitrary geometry/cell combinations — boxes straddling
    cell boundaries, inclusive edges, single-point boxes."""
    from ros_sql_spark.operators.spatial import grid_bbox_join

    boxes = [(100 + i, x1, y1, x1 + w, y1 + h)
             for i, (x1, y1, w, h) in enumerate(b)]
    probe = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(p)],
        "p_id int, px int, py int",
    )
    bdf = spark.createDataFrame(
        boxes, "b_id int, x1 int, y1 int, x2 int, y2 int"
    )
    got = {
        (r["p_id"], r["b_id"])
        for r in grid_bbox_join(probe, bdf, g,
                                max_cells_per_box=10_000).collect()
    }
    want = {
        (i, bid)
        for i, (x, y) in enumerate(p)
        for bid, x1, y1, x2, y2 in boxes
        if x1 <= x <= x2 and y1 <= y <= y2
    }
    assert got == want


def test_grid_bbox_join_guards_and_degenerate(spark):
    """The cell-blowup guard raises mid-scan (assert_true riding the
    row filter — not prunable); a degenerate box (x2 < x1) yields no
    pairs, matching BETWEEN."""
    from ros_sql_spark.operators.spatial import grid_bbox_join

    pts_df = spark.createDataFrame(
        [(1, 5, 5)], "p_id int, px int, py int"
    )
    big = spark.createDataFrame(
        [(1, 0, 0, 999, 999)], "b_id int, x1 int, y1 int, x2 int, y2 int"
    )
    with pytest.raises(Exception, match="covers more than"):
        grid_bbox_join(pts_df, big, 10, max_cells_per_box=16).collect()
    degen = spark.createDataFrame(
        [(1, 9, 0, 3, 9)], "b_id int, x1 int, y1 int, x2 int, y2 int"
    )
    assert grid_bbox_join(pts_df, degen, 10).count() == 0
    with pytest.raises(ValueError, match="cell"):
        grid_bbox_join(pts_df, degen, 0)
