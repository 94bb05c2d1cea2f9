"""Single import point for the full driver query registry."""

from deftunes_spark.driver_queries import ORACLES, QUERIES

# Importing registers the extension/coverage queries into the same maps.
import deftunes_spark.driver_queries_ext  # noqa: E402,F401
import deftunes_spark.driver_queries_cov  # noqa: E402,F401
import deftunes_spark.driver_queries_scale  # noqa: E402,F401
import deftunes_spark.driver_queries_olap  # noqa: E402,F401
import deftunes_spark.driver_queries_joins  # noqa: E402,F401
import deftunes_spark.driver_queries_warehouse  # noqa: E402,F401
import deftunes_spark.driver_queries_analytics  # noqa: E402,F401
import deftunes_spark.driver_queries_curation  # noqa: E402,F401
import deftunes_spark.driver_queries_training  # noqa: E402,F401
import deftunes_spark.driver_queries_semistruct  # noqa: E402,F401
import deftunes_spark.driver_queries_sqlsurface  # noqa: E402,F401
import deftunes_spark.driver_queries_r8  # noqa: E402,F401
import deftunes_spark.driver_queries_r9  # noqa: E402,F401
import deftunes_spark.driver_queries_r10  # noqa: E402,F401
import deftunes_spark.driver_queries_r11  # noqa: E402,F401
import deftunes_spark.driver_queries_r12  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES"]
