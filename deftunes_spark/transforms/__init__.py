from deftunes_spark.transforms.deftunes import (  # noqa: F401
    add_lineage_columns,
    sessions_explode,
    songs_enforce_schema,
    users_flatten,
)
