"""Object-store end-to-end consistency drill (VERDICT r5 directive 8,
extended r7 per directive 8): vacuum_orphans racing a crashed
in-flight compaction, a concurrent row-level delete, appends, AND the
exactly-once streaming sink (availableNow microbatches through
``streaming.sinks``) — all under ConditionalPutCommitProtocol.
Invariants: no manifest-referenced dir is ever vacuumed, the version
chain stays contiguous, every version's metadata row count matches its
scan, stream rows land exactly once, and the final snapshot is exactly
explained by the committed ops.
"""

from __future__ import annotations

import os
import threading
import time

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from deftunes_spark.io import versioned as V


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    del_key=st.integers(min_value=0, max_value=9),
    n_appends=st.integers(min_value=1, max_value=2),
    aged=st.booleans(),
    n_stream_files=st.integers(min_value=1, max_value=2),
)
def test_maintenance_triad_racing(
    spark, tmp_path_factory, del_key, n_appends, aged, n_stream_files
):
    t = str(tmp_path_factory.mktemp("triad") / "tbl")
    src = str(tmp_path_factory.mktemp("triad_src"))
    proto = V.ConditionalPutCommitProtocol()
    base = spark.createDataFrame([(i,) for i in range(10)], "id long")
    V.write_versioned(spark, base, t, mode="overwrite", protocol=proto)
    # Stream source backlog (ids 5000, 5001, …) split over
    # n_stream_files parquet files; maxFilesPerTrigger=1 below makes
    # each file its own microbatch → one table version per batch.
    stream_ids = list(range(5000, 5000 + n_stream_files))
    spark.createDataFrame(
        [(i,) for i in stream_ids], "id long"
    ).repartition(n_stream_files).write.mode("overwrite").parquet(src)

    # Crashed in-flight compaction: a data dir written but whose
    # manifest never published. Aged past the grace period it is an
    # orphan vacuum MUST collect; fresh it is indistinguishable from
    # a live writer mid-commit and vacuum MUST leave it.
    crashed = os.path.join(t, "_v99-crashed0")
    os.makedirs(crashed)
    with open(os.path.join(crashed, "part-0.parquet"), "wb") as f:
        f.write(b"x")
    if aged:
        old = time.time() - 7200
        os.utime(crashed, (old, old))

    flags = {"delete": False, "compact": False}
    errs: list[Exception] = []

    def run_delete():
        try:
            V.delete_where(spark, t, f"id = {del_key}", protocol=proto)
            flags["delete"] = True
        except V.CommitConflict:
            pass
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    def run_compact():
        try:
            V.compact_versioned(spark, t, protocol=proto)
            flags["compact"] = True
        except V.CommitConflict:
            pass
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    def run_append(i):
        try:
            df = spark.createDataFrame([((i + 1) * 1000,)], "id long")
            V.write_versioned(
                spark, df, t, mode="append", protocol=proto
            )
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    def run_vacuum():
        try:
            V.vacuum_orphans(spark, t, grace_ms=3600 * 1000)
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    def run_stream():
        # Fourth racer (r6 verdict #8): the exactly-once streaming
        # sink drains the backlog into the SAME table while delete/
        # compact/vacuum/appends race it; each microbatch append
        # inherits the optimistic-commit retry, so it always lands.
        from pyspark.sql.types import LongType, StructField, StructType

        from deftunes_spark.streaming.sinks import (
            stream_to_versioned_table,
        )

        try:
            stream_to_versioned_table(
                spark,
                src,
                StructType([StructField("id", LongType())]),
                t,
                max_files_per_trigger=1,
                protocol=proto,
                query_name="triad_stream",
            )
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    threads = [
        threading.Thread(target=run_delete),
        threading.Thread(target=run_compact),
        threading.Thread(target=run_vacuum),
        threading.Thread(target=run_stream),
    ] + [
        threading.Thread(target=run_append, args=(i,))
        for i in range(n_appends)
    ]
    for x in threads:
        x.start()
    for x in threads:
        x.join()
    assert not errs, errs

    manifests = V.list_versions(spark, t)
    versions = [m["version"] for m in manifests]
    # Contiguous chain: base + one commit per op that reported
    # success + one commit per stream microbatch (each manifest
    # carries its stream_batch_id — exactly-once means ids are
    # distinct and number at most the file count).
    stream_batches = [
        m["stream_batch_id"]
        for m in manifests
        if m.get("stream_id") is not None
    ]
    assert len(set(stream_batches)) == len(stream_batches)
    assert 1 <= len(stream_batches) <= n_stream_files
    n_committed = (
        n_appends
        + flags["delete"]
        + flags["compact"]
        + len(stream_batches)
    )
    assert versions == list(range(n_committed + 1))

    # No referenced dir was vacuumed — every version still scans, and
    # its scan matches the manifest's row count.
    for m in manifests:
        for d in V._manifest_dirs(m):
            assert os.path.isdir(d), f"referenced dir vacuumed: {d}"
        got = V.read_version(spark, t, version=m["version"]).count()
        assert got == m["rows"], (m["version"], got, m["rows"])

    # The crashed compaction dir: collected iff aged past grace.
    assert os.path.isdir(crashed) == (not aged)

    # Final snapshot is exactly the committed ops' composition: the
    # base ids, minus the deleted key iff the delete committed (MOR
    # predicates survive compaction's fold and later appends), plus
    # every append's payload (appends always commit).
    final = sorted(
        r.id for r in V.read_version(spark, t).collect()
    )
    want = (
        set(range(10))
        | {(i + 1) * 1000 for i in range(n_appends)}
        | set(stream_ids)  # exactly once: no dupes possible (sorted
        # list vs set equality below would catch a double-append)
    )
    if flags["delete"]:
        want.discard(del_key)
    assert final == sorted(want)
