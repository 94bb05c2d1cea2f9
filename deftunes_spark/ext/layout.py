"""Multi-dimensional data layout: Z-order (Morton) clustering.

Parquet scans prune on per-file/row-group min-max statistics; a table
range-sorted on ONE key gives tight stats for that key only — a
predicate on a second key still reads every file. Interleaving the
key bits (Morton / Z-order curve) localizes ALL participating keys at
once: each output file covers a small hyper-rectangle, so min-max
stats stay tight on every z-ordered column and predicates on any of
them skip most files. This is the layout trick Delta/Iceberg expose
as ``OPTIMIZE ZORDER BY``, built here from first principles as a sort
key — no table format required.

The z-value is emitted as a SQL expression string (``zvalue_sql``) so
the exact same arithmetic runs in Spark (via ``F.expr``) and in any
ANSI engine (the driver's DuckDB oracle) — bit-identical, fully
inside whole-stage codegen, no UDF.

Scale shape: ``zorder_write`` is repartitionByRange + in-partition
sort on the z-value — the same two-exchange layout job as a plain
range-sorted write; the curve only changes the sort key. AQE sizes
the range partitions; the sort is spillable. At 100 TB this is the
standard nightly compaction pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue_sql(cols: Sequence[str], bits: int = 12) -> str:
    """SQL expression interleaving the low ``bits`` bits of each
    (non-negative integer) column into a Morton code.

    Bit ``j`` of column ``c`` (index ``i`` in ``cols``) lands at
    position ``j * len(cols) + i`` — disjoint positions, so the terms
    combine with ``+`` (engine-neutral; ``|`` precedence differs
    across dialects). 2 cols × 12 bits = 24 terms: trivial for
    codegen, and identical text runs on Spark SQL and DuckDB.
    """
    n = len(cols)
    if n == 0 or bits < 1:
        raise ValueError("zvalue needs >=1 column and bits >= 1")
    if bits * n > 63:
        # Position 63 is the sign bit and BIGINT shifts mask the
        # count to 6 bits (<<64 == <<0), so wider codes would
        # silently collide terms and corrupt the curve — and diverge
        # between engines with different >=64-shift semantics.
        raise ValueError(
            f"zvalue: bits({bits}) x cols({n}) = {bits * n} exceeds "
            f"63 usable BIGINT bit positions; lower bits or cluster "
            f"on fewer columns"
        )
    terms = []
    for i, c in enumerate(cols):
        masked = f"(CAST({c} AS BIGINT) & {(1 << bits) - 1})"
        for j in range(bits):
            pos = j * n + i
            terms.append(f"((({masked} >> {j}) & 1) << {pos})")
    return "(" + " + ".join(terms) + ")"


def zvalue_col(cols: Sequence[str], bits: int = 12) -> Column:
    """The Morton code as a Spark Column (codegen, no UDF)."""
    return F.expr(zvalue_sql(cols, bits))


def zorder_write(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    n_files: int = 16,
    bits: int = 12,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve over
    ``cols``: range-partition by z-value (contiguous curve segments
    per file), sort within partitions, drop the helper column. Each
    file then covers a compact hyper-rectangle in ``cols`` space —
    min-max stats prune on every clustered column."""
    z = df.withColumn("_zval", zvalue_col(cols, bits))
    (
        z.repartitionByRange(n_files, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------
# Small-file compaction
# ---------------------------------------------------------------------


def path_file_stats(spark, path: str, suffix: str = ".parquet") -> tuple[int, int]:
    """(file_count, total_bytes) of data files under ``path``, via the
    Hadoop FileSystem API — works on any supported filesystem (local,
    HDFS, object stores), not just the local disk."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    it = fs.listFiles(p, True)
    n = total = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(suffix) and not name.startswith(("_", ".")):
            n += 1
            total += st.getLen()
    return n, total


def compact_path(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> dict:
    """Rewrite a small-files directory into ~``target_file_bytes``
    files — the nightly table-maintenance pass every streaming /
    micro-batch ingest needs (a 100 TB table fed by 15-min batches
    accretes millions of KB-scale files; scan task scheduling, not IO,
    becomes the bottleneck).

    Sizing is measured, not guessed: file count = ceil(current_bytes /
    target). The rewrite round-robins rows (``repartition(n)``) for
    even output sizes, writes to a staging dir, then swaps via rename.

    Crash safety: a directory swap on a rename-based FS is two renames
    (``path→old``, ``staging→path``) and cannot be atomic, so the
    protocol is roll-forward-able at every step instead. The staging
    write completes (``_SUCCESS`` marker) before any rename; ``__old``
    is retained until the new ``path`` is verified live (non-empty
    stats) and only then deleted. A crash at ANY point leaves a state
    ``recover_compact_path`` repairs deterministically: staging
    complete + path missing → finish the swap; staging absent/partial
    + path missing → roll back ``__old``; path live → sweep residue.
    Returns {files_before, bytes_before, files_after}.
    """
    import math

    n_before, bytes_before = path_file_stats(spark, path, f".{fmt}")
    n_target = max(1, math.ceil(bytes_before / target_file_bytes))
    df = spark.read.format(fmt).load(path)

    staging, old = f"{path}__compact_staging", f"{path}__old"
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(conf)

    def _p(s):
        return jvm.org.apache.hadoop.fs.Path(s)

    for residue in (staging, old):
        fs.delete(_p(residue), True)
    df.repartition(n_target).write.mode("overwrite").format(fmt).save(
        staging
    )
    # Hadoop rename reports failure via its boolean return, not an
    # exception — a discarded False here would let the later cleanup
    # delete the only surviving copy.
    if not fs.rename(_p(path), _p(old)):
        raise RuntimeError(
            f"compaction: rename {path} -> {old} failed; table untouched"
        )
    if not fs.rename(_p(staging), _p(path)):
        # Put the original back before surfacing the failure.
        fs.rename(_p(old), _p(path))
        raise RuntimeError(
            f"compaction: rename {staging} -> {path} failed; "
            "original table restored"
        )
    # Verify the new path is actually live BEFORE dropping the only
    # remaining copy of the previous table state.
    n_after, bytes_after = path_file_stats(spark, path, f".{fmt}")
    if n_after == 0 or bytes_after == 0:
        # Swap did not land (rename raced/failed) — roll back.
        fs.delete(_p(path), True)
        fs.rename(_p(old), _p(path))
        raise RuntimeError(
            f"compaction swap verification failed for {path}; "
            "original table restored from __old"
        )
    fs.delete(_p(old), True)
    return {
        "files_before": n_before,
        "bytes_before": bytes_before,
        "files_after": n_after,
    }


def recover_compact_path(spark, path: str, fmt: str = "parquet") -> str:
    """Repair an interrupted ``compact_path`` swap; idempotent.

    Decision table (returns the action taken):

    - ``path`` live → sweep ``__compact_staging``/``__old`` residue
      (``"clean"`` / ``"swept_residue"``).
    - ``path`` missing, staging COMPLETE (``_SUCCESS`` present) →
      roll forward: ``staging→path``, drop ``__old``
      (``"rolled_forward"``).
    - ``path`` missing, staging absent or partial → roll back:
      ``old→path``, drop staging (``"rolled_back"``).

    Run it before any read/write of ``path`` after an unclean shutdown
    (or wire it as the first step of the nightly maintenance job).
    """
    staging, old = f"{path}__compact_staging", f"{path}__old"
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(conf)

    def _p(s):
        return jvm.org.apache.hadoop.fs.Path(s)

    if fs.exists(_p(path)):
        swept = False
        for residue in (staging, old):
            if fs.exists(_p(residue)):
                fs.delete(_p(residue), True)
                swept = True
        return "swept_residue" if swept else "clean"

    staging_complete = fs.exists(_p(f"{staging}/_SUCCESS"))
    if staging_complete:
        # Only drop the __old backup once the roll-forward rename is
        # CONFIRMED (boolean return) — a failed rename followed by the
        # backup delete would leave the table unrecoverable.
        if not fs.rename(_p(staging), _p(path)):
            raise RuntimeError(
                f"recover: rename {staging} -> {path} failed; "
                "__old backup retained"
            )
        fs.delete(_p(old), True)
        return "rolled_forward"
    if fs.exists(_p(old)):
        fs.delete(_p(staging), True)
        if not fs.rename(_p(old), _p(path)):
            raise RuntimeError(
                f"recover: rename {old} -> {path} failed; "
                "backup left in place"
            )
        return "rolled_back"
    raise RuntimeError(
        f"{path}: no live table, no complete staging, no __old backup — "
        "not a compact_path crash state"
    )
