"""Roundtrip fidelity tests (SURVEY.md §5.2 layer 2 — the reference's own
test contract, ported): denormalize(normalize(df)) == df field-exact on
the FIXTURES.md Part B message shapes, including empty arrays,
zero-length blobs, NULL structs/arrays, and sub-µs stamp_nsecs.  Plus
the ordering property: children reassemble by STORED index even when the
child table's storage order is scrambled.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from ros_sql_spark.operators.normalize import denormalize, normalize

SEED = 42


def _rows_equal(a, b):
    return sorted(map(repr, a)) == sorted(map(repr, b))


def _roundtrip(spark, df, keys):
    norm = normalize(df, keys)
    rebuilt = denormalize(norm)
    assert rebuilt.schema == df.schema, (
        f"schema drift:\n{rebuilt.schema}\nvs\n{df.schema}"
    )
    left = [r.asDict(recursive=True) for r in df.collect()]
    right = [r.asDict(recursive=True) for r in rebuilt.collect()]
    assert _rows_equal(left, right)
    return norm


# --- F1: nested structs + Header-ish stamp (geometry_msgs/PoseStamped) ----

F1_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("stamp_secs", T.LongType()),
        T.StructField("stamp_nsecs", T.LongType()),
        T.StructField("frame_id", T.StringType()),
        T.StructField(
            "position",
            T.StructType(
                [
                    T.StructField("x", T.DoubleType()),
                    T.StructField("y", T.DoubleType()),
                    T.StructField("z", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "orientation",
            T.StructType(
                [
                    T.StructField("x", T.DoubleType()),
                    T.StructField("y", T.DoubleType()),
                    T.StructField("z", T.DoubleType()),
                    T.StructField("w", T.DoubleType()),
                ]
            ),
        ),
    ]
)


def _f1_rows(n=300):
    rng = random.Random(SEED)
    rows = []
    for i in range(n):
        pos = (rng.uniform(-10, 10), rng.uniform(-10, 10), rng.uniform(0, 2))
        ori = tuple(rng.uniform(-1, 1) for _ in range(4))
        rows.append(
            (
                f"/robot{i % 3}/pose",
                i,
                1_700_000_000 + i,
                rng.randrange(1_000_000_000),  # includes sub-µs values
                "map",
                pos if i % 17 else None,  # some NULL nested messages
                ori,
            )
        )
    return rows


def test_f1_pose_roundtrip(spark):
    df = spark.createDataFrame(_f1_rows(), F1_SCHEMA)
    norm = _roundtrip(spark, df, ["topic", "seq"])
    # struct shred produced 1:1 child tables (reference R4)
    assert set(norm.tables) == {"root", "root__position", "root__orientation"}


# --- F2: variable-length primitive arrays + blob (LaserScan-ish) ----------

F2_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("stamp_secs", T.LongType()),
        T.StructField("stamp_nsecs", T.LongType()),
        T.StructField("ranges", T.ArrayType(T.FloatType())),
        T.StructField("intensities", T.ArrayType(T.FloatType())),
        T.StructField("raw", T.BinaryType()),
    ]
)


def _f2_rows(n=200):
    rng = random.Random(SEED)
    rows = []
    for i in range(n):
        ln = rng.choice([0, 1, 5, 360]) if i % 7 == 0 else rng.randrange(0, 40)
        ranges = [rng.uniform(0, 30) for _ in range(ln)]
        rows.append(
            (
                "/scan",
                i,
                1_700_000_000 + i,
                rng.randrange(1_000_000_000),
                None if i % 23 == 0 else ranges,  # NULL arrays
                ranges,
                b"" if i % 11 == 0 else bytes(rng.randrange(256) for _ in range(rng.randrange(0, 64))),
            )
        )
    return rows


def test_f2_scan_roundtrip(spark):
    df = spark.createDataFrame(_f2_rows(), F2_SCHEMA)
    norm = _roundtrip(spark, df, ["topic", "seq"])
    # blob (uint8[]) stays inline in the parent (reference R6)
    assert "raw" in norm.tables["root"].columns
    assert set(norm.tables) == {"root", "root__ranges", "root__intensities"}


# --- F3: arrays of nested structs (Marker-ish) -----------------------------

F3_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("ns", T.StringType()),
        T.StructField(
            "points",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("x", T.DoubleType()),
                        T.StructField("y", T.DoubleType()),
                        T.StructField("z", T.DoubleType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "colors",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("r", T.FloatType()),
                        T.StructField("g", T.FloatType()),
                        T.StructField("b", T.FloatType()),
                        T.StructField("a", T.FloatType()),
                    ]
                )
            ),
        ),
        T.StructField("text", T.StringType()),
    ]
)


def _f3_rows(n=150):
    rng = random.Random(SEED)
    rows = []
    for i in range(n):
        k = rng.randrange(0, 8)
        pts = [
            (rng.uniform(-5, 5), rng.uniform(-5, 5), rng.uniform(-5, 5))
            for _ in range(k)
        ]
        cols = [
            (rng.random(), rng.random(), rng.random(), 1.0) for _ in range(k)
        ]
        rows.append(("/marker", i, f"ns{i % 4}", pts, cols, f"m{i}"))
    return rows


def test_f3_marker_roundtrip(spark):
    df = spark.createDataFrame(_f3_rows(), F3_SCHEMA)
    norm = _roundtrip(spark, df, ["topic", "seq"])
    assert set(norm.tables) == {"root", "root__points", "root__colors"}


def test_reassembly_uses_stored_index_not_storage_order(spark):
    """The reference's sql2msg orders child rows by the stored idx column
    (SURVEY.md §2.1 R11); scrambling child-table storage order must not
    change the rebuilt arrays."""
    df = spark.createDataFrame(_f3_rows(80), F3_SCHEMA)
    norm = normalize(df, ["topic", "seq"])
    for name, tbl in list(norm.tables.items()):
        if name != "root":
            norm.tables[name] = tbl.orderBy(F.xxhash64(*tbl.columns))  # scramble
    rebuilt = denormalize(norm)
    left = [r.asDict(recursive=True) for r in df.collect()]
    right = [r.asDict(recursive=True) for r in rebuilt.collect()]
    assert _rows_equal(left, right)


def test_embeddings_shred_reassemble_identity(spark):
    """sort ∘ shred ∘ reassemble identity on the real embeddings table
    (SURVEY.md §5.2)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    norm = normalize(emb, ["vec_id"], table="embeddings")
    rebuilt = denormalize(norm)
    left = [r.asDict(recursive=True) for r in emb.collect()]
    right = [r.asDict(recursive=True) for r in rebuilt.collect()]
    assert _rows_equal(left, right)


def test_validate_keys_rejects_duplicates(spark):
    dup = spark.createDataFrame([(1, [10, 20]), (1, [30])], "k int, a array<int>")
    with pytest.raises(ValueError, match="not unique"):
        normalize(dup, ["k"], validate_keys=True)
