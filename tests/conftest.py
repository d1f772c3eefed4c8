"""Shared Spark session + DuckDB oracle fixtures."""

from __future__ import annotations

import pytest

from ros_sql_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"

TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    import os
    import tempfile

    # static conf: must be set before the session exists (bucketed-table
    # tests need a scratch warehouse)
    os.environ.setdefault("SPARK_GRAFT_WAREHOUSE", tempfile.mkdtemp(prefix="rosql_wh_"))
    from pyspark.sql import SparkSession

    from ros_sql_spark.session import configure_builder

    builder = (
        SparkSession.builder.appName("ros_sql_spark-tests")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", os.environ["SPARK_GRAFT_WAREHOUSE"])
    )
    s = configure_builder(builder).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the driver's view-registration convention."""
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


def register_duck_views(con, sf_dir: str) -> None:
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
