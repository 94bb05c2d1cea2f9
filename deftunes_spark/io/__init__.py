from deftunes_spark.io.readers import (  # noqa: F401
    TESTDATA_TABLES,
    fetch_rest_window,
    fetch_rest_windows,
    fetch_rest_windows_distributed,
    load_table,
    load_tables,
    read_csv_landing,
    read_jdbc_table,
    read_json_landing,
    read_json_literal,
)
from deftunes_spark.io.versioned import (  # noqa: F401
    expire_versions,
    latest_version,
    list_versions,
    read_version,
    write_versioned,
)
from deftunes_spark.io.writers import (  # noqa: F401
    write_landing_csv,
    write_landing_json,
    write_table_append_or_create,
)
