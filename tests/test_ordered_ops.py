"""Property tests for operators/ordered.py: the bucket-decomposed
constructions must equal their single-partition textbook forms on
arbitrary inputs — empty buckets, all-equal keys, duplicate points,
single rows, constant x (the degenerate one-bucket binning), negative
values.  The textbook forms (a global window / brute-force dominance)
are fine HERE: inputs are tiny and the point is the reference
semantics, not the plan."""

from __future__ import annotations

import pytest
from tests.conftest import prop_examples
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ros_sql_spark.operators.ordered import bucketed_row_number, skyline_2d

pytestmark = pytest.mark.slow  # ~1 Spark job per hypothesis example


# bucket ints from a small range → collisions AND empty ranges likely
rows = st.lists(
    st.tuples(st.integers(-3, 3), st.integers(0, 50)),
    min_size=1,
    max_size=30,
)


@given(data=rows)
@settings(
    max_examples=prop_examples(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bucketed_row_number_equals_global_window(spark, data):
    # unique id per row makes (bkt, key, id) a total order
    df = spark.createDataFrame(
        [(b, k, i) for i, (b, k) in enumerate(data)],
        "bkt int, key int, id int",
    )
    got = {
        (r["bkt"], r["key"], r["id"]): r["_rn"]
        for r in bucketed_row_number(df, "bkt", ["key", "id"]).collect()
    }
    w = Window.orderBy("bkt", "key", "id")
    want = {
        (r["bkt"], r["key"], r["id"]): r["_rn"]
        for r in df.withColumn(
            "_rn", F.row_number().over(w)
        ).collect()
    }
    assert got == want


points = st.lists(
    st.tuples(st.integers(-5, 5), st.integers(-5, 5)),
    min_size=1,
    max_size=25,
)


@given(data=points)
@settings(
    max_examples=prop_examples(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_skyline_equals_brute_force(spark, data):
    df = spark.createDataFrame(
        [(x, y, i) for i, (x, y) in enumerate(data)],
        "x int, y int, id int",
    )
    got = sorted(
        r["id"] for r in skyline_2d(df, "x", "y", n_buckets=4).collect()
    )
    want = sorted(
        i
        for i, (x, y) in enumerate(data)
        if not any(
            qx <= x and qy >= y and (qx < x or qy > y)
            for qx, qy in data
        )
    )
    assert got == want


def test_skyline_constant_x_keeps_only_max_y(spark):
    """Degenerate binning: lo == hi collapses every row into bucket 0;
    the frontier is exactly the max-y rows (ties all kept)."""
    df = spark.createDataFrame(
        [(7, 1, 0), (7, 9, 1), (7, 9, 2), (7, 3, 3)], "x int, y int, id int"
    )
    got = sorted(r["id"] for r in skyline_2d(df, "x", "y").collect())
    assert got == [1, 2]


def test_bucketed_row_number_string_buckets(spark):
    """qx59's real shape: string buckets (key prefixes), string order
    columns, bucket sizes 1..n with gaps in the alphabet."""
    data = [
        ("a", "apple", 1),
        ("a", "axe", 2),
        ("c", "car", 3),
        ("f", "fig", 4),
        ("f", "fig", 5),  # tie on key broken by id
    ]
    df = spark.createDataFrame(data, "bkt string, key string, id int")
    got = {
        r["id"]: r["_rn"]
        for r in bucketed_row_number(df, "bkt", ["key", "id"]).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3, 4: 4, 5: 5}


part_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(-3, 3), st.integers(0, 50)),
    min_size=1,
    max_size=30,
)


@given(data=part_rows)
@settings(
    max_examples=prop_examples(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_partitioned_row_number_equals_group_window(spark, data):
    """partition_cols: the rank restarts per group and equals the
    textbook per-group window for arbitrary group/bucket collisions
    (including groups missing whole bucket ranges)."""
    df = spark.createDataFrame(
        [(g, b, k, i) for i, (g, b, k) in enumerate(data)],
        "grp int, bkt int, key int, id int",
    )
    got = {
        r["id"]: r["_rn"]
        for r in bucketed_row_number(
            df, "bkt", ["key", "id"], partition_cols=["grp"]
        ).collect()
    }
    w = Window.partitionBy("grp").orderBy("bkt", "key", "id")
    want = {
        r["id"]: r["_rn"]
        for r in df.withColumn("_rn", F.row_number().over(w)).collect()
    }
    assert got == want


sum_rows = st.lists(
    st.tuples(st.integers(-3, 3), st.integers(0, 50), st.integers(-9, 9)),
    min_size=1,
    max_size=30,
)


@given(data=sum_rows)
@settings(
    max_examples=prop_examples(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bucketed_running_sum_equals_global_window(spark, data):
    from ros_sql_spark.operators.ordered import bucketed_running_sum

    df = spark.createDataFrame(
        [(b, k, i, v) for i, (b, k, v) in enumerate(data)],
        "bkt int, key int, id int, v int",
    )
    got = {
        r["id"]: r["_cum"]
        for r in bucketed_running_sum(
            df, "bkt", ["key", "id"], "v"
        ).collect()
    }
    w = (
        Window.orderBy("bkt", "key", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r["id"]: r["_cum"]
        for r in df.withColumn("_cum", F.sum("v").over(w)).collect()
    }
    assert got == want


@given(data=st.lists(
    st.tuples(st.integers(0, 2), st.integers(-3, 3),
              st.integers(-5, 5)),
    min_size=1, max_size=30,
))
@settings(
    max_examples=prop_examples(12),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_partitioned_running_sum_equals_group_window(spark, data):
    from ros_sql_spark.operators.ordered import bucketed_running_sum

    df = spark.createDataFrame(
        [(g, b, i, v) for i, (g, b, v) in enumerate(data)],
        "grp int, bkt int, id int, v int",
    )
    got = {
        r["id"]: r["_cum"]
        for r in bucketed_running_sum(
            df, "bkt", ["id"], "v", partition_cols=["grp"]
        ).collect()
    }
    w = (
        Window.partitionBy("grp")
        .orderBy("bkt", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r["id"]: r["_cum"]
        for r in df.withColumn("_cum", F.sum("v").over(w)).collect()
    }
    assert got == want


@given(data=st.lists(
    st.tuples(st.integers(-3, 3),
              st.one_of(st.none(), st.integers(-5, 5))),
    min_size=1, max_size=25,
))
@settings(
    max_examples=prop_examples(12),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bucketed_running_sum_null_values(spark, data):
    """Round-12 self-review fix: NULL values contribute nothing but
    must NOT poison the carried total — the result is NULL exactly
    when no non-null value exists at-or-before the row (textbook
    window-sum semantics), including all-NULL leading buckets."""
    from ros_sql_spark.operators.ordered import bucketed_running_sum

    df = spark.createDataFrame(
        [(b, i, v) for i, (b, v) in enumerate(data)],
        "bkt int, id int, v int",
    )
    got = {
        r["id"]: r["_cum"]
        for r in bucketed_running_sum(df, "bkt", ["id"], "v").collect()
    }
    w = (
        Window.orderBy("bkt", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r["id"]: r["_cum"]
        for r in df.withColumn("_cum", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_affine_bucket_data_scaled_and_null(spark):
    """Round-13 directive #1: with no explicit n_buckets the bucket
    count derives from the frame size — clamp(ceil(N/target),
    min, max) — and the rank built over the data-scaled binning still
    equals the textbook global rank (the identity holds for ANY
    monotone binning).  NULL input values map to a NULL bucket (the
    ADVICE trap: F.least must not smuggle them into the top bucket)."""
    from ros_sql_spark.operators.ordered import affine_bucket

    n = 500
    df = spark.createDataFrame(
        [(i, (i * 37) % 211) for i in range(n)], "id int, v int"
    )
    # target 10 rows/bucket, clamp [2, 32]: 500/10 = 50 → capped at 32
    b = affine_bucket(
        df, "v", target_rows=10, min_buckets=2, max_buckets=32
    )
    nb = b.select("_bkt").distinct().count()
    assert 16 <= nb <= 32  # many buckets materialize, cap respected
    assert b.agg(F.max("_bkt")).collect()[0][0] <= 31
    # clamp floor: huge target → min_buckets bound, still correct
    ranked = bucketed_row_number(
        affine_bucket(df, "v", target_rows=10, min_buckets=2,
                      max_buckets=32),
        "_bkt",
        ["v", "id"],
    )
    got = {r["id"]: r["_rn"] for r in ranked.collect()}
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["_rn"]
        for r in df.withColumn("_rn", F.row_number().over(w)).collect()
    }
    assert got == want
    # NULL value → NULL bucket, non-null rows unaffected
    dn = spark.createDataFrame(
        [(1, 10), (2, None), (3, 20)], "id int, v int"
    )
    out = {r["id"]: r["_bkt"] for r in affine_bucket(dn, "v").collect()}
    assert out[2] is None and out[1] is not None and out[3] is not None
