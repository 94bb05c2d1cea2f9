from deftunes_spark.models.registry import Model, ModelRegistry  # noqa: F401
from deftunes_spark.models.star import (  # noqa: F401
    dim_artists,
    dim_songs,
    dim_users,
    fact_session,
    sales_per_artist,
    sales_per_country,
)
