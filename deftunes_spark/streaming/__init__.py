from deftunes_spark.streaming.stateful import (  # noqa: F401
    session_stats_stateful,
)
from deftunes_spark.streaming.windows import (  # noqa: F401
    run_stream_once,
    sessionize_batch,
    sliding_agg_batch,
    tumbling_agg_batch,
    tumbling_agg_stream,
)
