from deftunes_spark.streaming.windows import (  # noqa: F401
    run_stream_once,
    sessionize_batch,
    tumbling_agg_batch,
    tumbling_agg_stream,
)
