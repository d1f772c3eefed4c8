from ros_sql_spark.functions.parity import money, r6, tus  # noqa: F401
