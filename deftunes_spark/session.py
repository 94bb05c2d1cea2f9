"""SparkSession factory with scale-oriented defaults.

The reference pins only two Spark confs (dynamic partition overwrite in
both transform jobs: de-c4w4a2-transform-json-job.py:57,
de-c4w4a2-transform-songs-job.py:53). We keep those and add the
cluster-scale defaults Catalyst/AQE need to behave well at 100 TB:
adaptive execution (runtime re-plan, partition coalescing, skew-join
splitting), UTC session time (stable timestamp semantics vs the
oracle), and Arrow for any pandas exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for a large cluster; all overridable via extra_conf.
_DEFAULT_CONF: dict[str, str] = {
    # Deterministic timestamp semantics (SURVEY §7 "hard parts").
    "spark.sql.session.timeZone": "UTC",
    # Idempotent per-partition rewrites (reference K5 semantics).
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # AQE: runtime shuffle-partition coalescing + skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow-batched pandas exchange for the few pandas_udf operators.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Star-schema joins: let small dims broadcast (default 10MB is fine
    # for the reference dims; raise for bigger clusters as needed).
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    # Scan parallelism: keep input splits bounded so a 100 TB scan
    # yields sanely-sized tasks instead of a handful of huge ones.
    "spark.sql.files.maxPartitionBytes": "128MB",
    # Quieter, faster local runs; harmless on a cluster.
    "spark.ui.enabled": "false",
    "spark.sql.shuffle.partitions": "32",
}


def _local_driver_memory() -> str:
    """local[N] runs every task inside the driver JVM — the 1g default
    heap starves 32 concurrent tasks into GC death, while a hardcoded
    large -Xmx on a small host would outrun physical memory and get
    OOM-killed instead of spilling. Size to ~half of physical RAM,
    clamped to [2g, 48g]; overridable via extra_conf. Applied only at
    JVM launch (getOrCreate ignores it on a live session); cluster
    deployments size executors via spark-submit as usual."""
    try:
        total_gb = (
            os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        ) / (1024**3)
    except (ValueError, OSError, AttributeError):
        total_gb = 8.0
    return f"{max(2, min(48, int(total_gb * 0.5)))}g"


def get_spark(
    app_name: str = "deftunes-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when no cluster
    master is configured — on a real deployment, spark-submit supplies
    the master and this falls through.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULT_CONF)
    if master and master.startswith("local"):
        conf["spark.driver.memory"] = _local_driver_memory()
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
