"""Lineage cutting for iterative DataFrame programs.

Iterative ops (PageRank supersteps, component label propagation, the
multi-branch MinHash signature table, PQ sub-fits) must materialize
intermediate state: without it the whole upstream plan re-executes per
round and the plan tree grows unboundedly.

Two materialization modes, selected by ``reliable``:

- ``reliable=False`` (default): ``localCheckpoint`` — blocks live in
  executor storage memory. Cheapest, and on ``local[*]`` (one JVM)
  exactly right. On a real cluster an executor loss deletes its
  blocks and the lineage needed to recompute them is already cut, so
  the JOB DIES mid-iteration — acceptable for short interactive runs,
  wrong for a 12-hour 100 TB job.
- ``reliable=True``: ``checkpoint`` — blocks are written to the
  configured checkpoint directory (HDFS/S3 on a cluster), surviving
  any executor loss. Costs a distributed-FS write per cut; for a
  long iterative job that is the correct trade.

Callers opt in per call; ``ensure_checkpoint_dir`` gives local runs
and tests a one-line setup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_checkpoint_dir(spark: SparkSession, path: str) -> None:
    """Set the reliable-checkpoint directory if not already set."""
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(path)


def cut_lineage(df: DataFrame, reliable: bool = False) -> DataFrame:
    """Materialize ``df`` and truncate its logical plan.

    ``reliable=True`` requires ``spark.sparkContext.setCheckpointDir``
    (or ``ensure_checkpoint_dir``) to have been called — fails fast
    with a clear message otherwise, rather than Spark's late
    ``Checkpoint directory has not been set`` job failure.
    """
    if not reliable:
        return df.localCheckpoint()
    if df.sparkSession.sparkContext.getCheckpointDir() is None:
        raise ValueError(
            "reliable=True needs a checkpoint dir: call "
            "spark.sparkContext.setCheckpointDir(<hdfs/s3 path>) "
            "(or ext.lineage.ensure_checkpoint_dir) first"
        )
    return df.checkpoint(eager=True)
