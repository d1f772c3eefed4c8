"""ROS-style primitive type mapping → Spark SQL types.

Reference parity: strawlab/ros_sql derives one SQLAlchemy column type per
ROS primitive via a module-level type map and recursive descent over a
message class's __slots__/_slot_types (factories.py type_map /
generate_schema_raw — SURVEY.md §2.1 R1/R2).  Here the same contract is
expressed as ROS type string → pyspark.sql.types, with message specs as
plain dicts (field → type-string or nested spec) instead of generated
Python classes.

Widening rules (SURVEY.md §1.1 — Spark integers are signed):
- uint8/char → ShortType, uint16 → IntegerType, uint32 → LongType
  (each widened one step so the full unsigned domain fits);
- uint64 has no safe signed container → DecimalType(20,0), which holds
  the full 0..2^64-1 domain exactly;
- time/duration are (secs:int32, nsecs:int32) pairs at ns resolution →
  a STRUCT<secs BIGINT, nsecs BIGINT> by default; the split/recombine
  twins live in ros_sql_spark.functions.timeops (R8);
- uint8[] is a blob, NOT an array of shorts → BinaryType (R6).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

__all__ = [
    "ROS_PRIMITIVE_TO_SPARK",
    "TIME_STRUCT",
    "ros_type_to_spark",
    "message_schema",
]

TIME_STRUCT = T.StructType(
    [
        T.StructField("secs", T.LongType(), True),
        T.StructField("nsecs", T.LongType(), True),
    ]
)

ROS_PRIMITIVE_TO_SPARK: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "int8": T.ByteType(),
    "byte": T.ByteType(),  # ROS1 alias for int8
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "uint8": T.ShortType(),  # widened: unsigned 0..255
    "char": T.ShortType(),  # ROS1 alias for uint8
    "uint16": T.IntegerType(),  # widened: 0..65535
    "uint32": T.LongType(),  # widened: 0..2^32-1
    "uint64": T.DecimalType(20, 0),  # no signed container holds 2^64-1
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "string": T.StringType(),
    "time": TIME_STRUCT,
    "duration": TIME_STRUCT,
}

_ARRAY_RE = re.compile(r"^(?P<elem>.+?)\[(?P<len>\d*)\]$")


def ros_type_to_spark(ros_type: str) -> T.DataType:
    """Map one ROS field type string to a Spark DataType.

    Handles primitives, fixed ``T[n]`` / variable ``T[]`` arrays, and the
    ``uint8[]``/``char[]`` blob special case.  Spark has no fixed-length
    array type, so ``T[n]`` maps to ArrayType(T) — length enforcement is
    a write-time constraint, not a type (matches the reference, which
    also stores fixed arrays as child rows).
    """
    m = _ARRAY_RE.match(ros_type.strip())
    if m:
        elem = m.group("elem").strip()
        if elem in ("uint8", "char", "byte"):
            return T.BinaryType()  # R6 blob passthrough, never shredded
        return T.ArrayType(ros_type_to_spark(elem), containsNull=False)
    prim = ROS_PRIMITIVE_TO_SPARK.get(ros_type.strip())
    if prim is None:
        raise ValueError(f"unknown ROS type string: {ros_type!r}")
    return prim


MessageSpec = dict  # field name -> ROS type string | nested MessageSpec | list


def message_schema(spec: MessageSpec) -> T.StructType:
    """Build a Spark StructType from a dict-shaped message spec.

    Spec grammar (mirrors __slots__/_slot_types introspection):
      {"x": "float64",                      # primitive
       "stamp": "time",                     # time/duration struct
       "ranges": "float32[]",               # array (→ ArrayType)
       "raw": "uint8[]",                    # blob (→ BinaryType)
       "pose": {"x": "float64", ...},       # nested message (→ StructType)
       "points": [{"x": "float64", ...}]}   # array of nested messages
    """
    fields = []
    for name, t in spec.items():
        if isinstance(t, dict):
            dt: T.DataType = message_schema(t)
        elif isinstance(t, list):
            if len(t) != 1 or not isinstance(t[0], dict):
                raise ValueError(f"array-of-message spec for {name!r} must be [dict]")
            dt = T.ArrayType(message_schema(t[0]), containsNull=False)
        else:
            dt = ros_type_to_spark(t)
        fields.append(T.StructField(name, dt, True))
    return T.StructType(fields)
