from ros_sql_spark.plans.queries import QUERIES  # noqa: F401
from ros_sql_spark.plans.oracles import ORACLES  # noqa: F401
