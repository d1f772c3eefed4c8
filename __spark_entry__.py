"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (q11_pricing_summary, TPC-H Q1 shape) at
                sf0.001; smoke check rows > 0.
queries()     — the declared suite from SURVEY.md §2.3, implemented in
                ros_sql_spark.plans.queries.
oracle_sql()  — matching DuckDB SQL (ros_sql_spark.plans.oracles);
                q78/q84/qx09 intentionally omitted (rows-only:
                KMeans/codebook float convergence and iterative-argmax
                recursion have no cross-engine oracle).  Round-8
                upgraded q26/q39/q40 to bit-for-bit oracles — EVERY
                in-window query is now value-exact under the gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ros_sql_spark.plans.oracles import ORACLES
from ros_sql_spark.plans.queries import QUERIES, q11_pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q11_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.3."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (see rows-only list above)."""
    return dict(ORACLES)
