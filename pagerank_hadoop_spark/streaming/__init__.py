from pagerank_hadoop_spark.streaming.windows import (  # noqa: F401
    read_events_stream,
    session_agg,
    sliding_agg,
    tumbling_agg,
)
