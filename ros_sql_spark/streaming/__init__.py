from ros_sql_spark.streaming.replay import (  # noqa: F401
    idempotent_sink_batch,
    session_counts,
    stream_events,
    tumbling_counts,
    write_idempotent,
)
