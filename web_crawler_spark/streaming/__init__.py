from web_crawler_spark.streaming.metrics import (  # noqa: F401
    host_metrics_stream,
    read_fetch_log_stream,
)
