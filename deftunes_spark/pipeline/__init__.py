from deftunes_spark.pipeline.runner import (  # noqa: F401
    Pipeline,
    PipelineTask,
    TaskFailure,
    monthly_windows,
)
