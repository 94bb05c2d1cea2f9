"""Versioned parquet tables (io/versioned.py): time travel, optimistic
concurrent commits, retention — the Iceberg-v2 user guarantees rebuilt
on plain parquet (SURVEY §1.3 boundary; VERDICT r2 'What's missing' #1).
"""

from __future__ import annotations

import threading

import pytest

from deftunes_spark.io import versioned as V


def test_write_read_versions_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    df1 = spark.createDataFrame([(3, "c")], "id long, s string")
    df2 = spark.createDataFrame([(9, "z")], "id long, s string")

    assert V.write_versioned(spark, df0, t, mode="overwrite") == 0
    assert V.write_versioned(spark, df1, t, mode="append") == 1
    assert V.write_versioned(spark, df2, t, mode="overwrite") == 2

    def ids(df):
        return sorted(r.id for r in df.collect())

    # Latest is the overwrite; history intact underneath.
    assert ids(V.read_version(spark, t)) == [9]
    assert ids(V.read_version(spark, t, version=0)) == [1, 2]
    assert ids(V.read_version(spark, t, version=1)) == [1, 2, 3]

    versions = V.list_versions(spark, t)
    assert [m["version"] for m in versions] == [0, 1, 2]
    assert [m["rows"] for m in versions] == [2, 3, 1]
    # Time travel by commit timestamp: as-of v1's ts resolves to the
    # newest version published at or before it.
    ts1 = versions[1]["ts_ms"]
    assert ids(V.read_version(spark, t, as_of_ts_ms=ts1)) == [1, 2, 3]
    with pytest.raises(ValueError, match="at or before"):
        V.read_version(spark, t, as_of_ts_ms=versions[0]["ts_ms"] - 10_000)


def test_concurrent_appends_serialize(spark, tmp_path):
    """Two racing appends must BOTH land (no lost update): the loser
    of the manifest rename retries against the winner's snapshot."""
    t = str(tmp_path / "race")
    base = spark.createDataFrame([(0,)], "id long")
    V.write_versioned(spark, base, t, mode="overwrite")

    errs = []

    def append(v):
        try:
            df = spark.createDataFrame([(v,)], "id long")
            V.write_versioned(spark, df, t, mode="append")
        except Exception as exc:  # pragma: no cover - failure detail
            errs.append(exc)

    threads = [threading.Thread(target=append, args=(v,)) for v in (1, 2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert V.latest_version(spark, t) == 2
    final = sorted(r.id for r in V.read_version(spark, t).collect())
    assert final == [0, 1, 2]


def test_manifest_publish_is_put_if_absent(spark, tmp_path):
    """The commit primitive itself: second publication of the same
    version number must fail, not overwrite."""
    t = str(tmp_path / "pia")
    ok1 = V._publish_manifest(
        spark, t, {"version": 5, "data_dir": "x", "ts_ms": 1, "mode": "o",
                   "rows": 0}
    )
    ok2 = V._publish_manifest(
        spark, t, {"version": 5, "data_dir": "y", "ts_ms": 2, "mode": "o",
                   "rows": 0}
    )
    assert ok1 is True and ok2 is False
    assert V.list_versions(spark, t)[0]["data_dir"] == "x"


def test_expire_versions_retention(spark, tmp_path):
    t = str(tmp_path / "exp")
    for i in range(4):
        V.write_versioned(
            spark,
            spark.createDataFrame([(i,)], "id long"),
            t,
            mode="overwrite",
        )
    assert V.expire_versions(spark, t, keep_last=2) == [0, 1]
    assert [m["version"] for m in V.list_versions(spark, t)] == [2, 3]
    # Expired snapshots are gone on disk too.
    with pytest.raises(ValueError, match="not published"):
        V.read_version(spark, t, version=0)
    assert [r.id for r in V.read_version(spark, t, version=3).collect()] == [3]


# ---------------------------------------------------------------------
# Model-based property test: random commit sequences vs an in-memory
# snapshot model — every published version stays readable with exactly
# its committed content, and time travel resolves like the model.
# ---------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ops = st.lists(
    st.tuples(
        st.sampled_from(["overwrite", "append"]),
        st.lists(
            st.integers(min_value=0, max_value=99),
            min_size=0,
            max_size=4,
            unique=True,
        ),
    ),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops)
def test_versioned_commits_match_snapshot_model(
    spark, tmp_path_factory, ops
):
    t = str(tmp_path_factory.mktemp("vprop") / "tbl")
    model = []  # model[v] = multiset of ids in version v
    for i, (mode, ids) in enumerate(ops):
        df = spark.createDataFrame(
            [(x + 1000 * i,) for x in ids] or [], "id long"
        )
        rows = [x + 1000 * i for x in ids]
        v = V.write_versioned(spark, df, t, mode=mode)
        assert v == len(model)
        if mode == "append" and model:
            model.append(sorted(model[-1] + rows))
        else:
            model.append(sorted(rows))
    for v, want in enumerate(model):
        got = sorted(r.id for r in V.read_version(spark, t, version=v).collect())
        assert got == want, f"version {v}"
    manifests = V.list_versions(spark, t)
    assert [m["version"] for m in manifests] == list(range(len(model)))
    assert [m["rows"] for m in manifests] == [len(w) for w in model]
    # as-of the last manifest's timestamp resolves to the newest version.
    last_ts = manifests[-1]["ts_ms"]
    got = sorted(
        r.id
        for r in V.read_version(spark, t, as_of_ts_ms=last_ts).collect()
    )
    assert got == model[-1]


# ---------------------------------------------------------------------
# Pluggable commit protocol (VERDICT r3 directive 5): the put-if-absent
# primitive behind manifest publication, with an object-store-shaped
# conditional-put implementation.
# ---------------------------------------------------------------------


def test_conditional_put_protocol_basic(spark, tmp_path):
    """ConditionalPutCommitProtocol (exclusive-create fallback) gives
    the same single-winner semantics as the rename protocol."""
    t = str(tmp_path / "cp")
    proto = V.ConditionalPutCommitProtocol()
    m = {"version": 7, "data_dir": "x", "ts_ms": 1, "mode": "o", "rows": 0}
    assert V._publish_manifest(spark, t, m, proto) is True
    m2 = dict(m, data_dir="y")
    assert V._publish_manifest(spark, t, m2, proto) is False
    assert V.list_versions(spark, t)[0]["data_dir"] == "x"


def test_conditional_put_custom_store_adapter(spark, tmp_path):
    """A user-supplied put_fn (the DynamoDB/S3-conditional-put adapter
    boundary) drives the commit decision; the FS below never sees a
    manifest the store rejected. Emulated with an in-memory store that
    also mirrors accepted payloads to disk so reads still work."""
    import threading as th

    t = str(tmp_path / "store")
    lock = th.Lock()
    store: dict[str, bytes] = {}

    def put_fn(key: str, payload: bytes) -> bool:
        with lock:  # the store's conditional write is atomic
            if key in store:
                return False
            store[key] = payload
        import os

        os.makedirs(os.path.dirname(key), exist_ok=True)
        with open(key, "wb") as f:
            f.write(payload)
        return True

    proto = V.ConditionalPutCommitProtocol(put_fn)
    df = spark.createDataFrame([(1,)], "id long")
    assert V.write_versioned(spark, df, t, protocol=proto) == 0
    assert V.write_versioned(spark, df, t, protocol=proto) == 1
    assert len(store) == 2
    assert [m["version"] for m in V.list_versions(spark, t)] == [0, 1]


@pytest.mark.parametrize("proto_name", ["rename", "cput"])
def test_commit_protocol_contention(spark, tmp_path, proto_name):
    """N writers racing the SAME version number through either
    protocol: exactly one winner, losers observe False and retry to
    distinct later versions — no manifest ever overwritten."""
    t = str(tmp_path / f"cont_{proto_name}")
    proto = (
        V.RenameCommitProtocol()
        if proto_name == "rename"
        else V.ConditionalPutCommitProtocol()
    )
    import threading as th

    wins = []

    def commit(i):
        m = {"version": 3, "data_dir": f"d{i}", "ts_ms": i, "mode": "o",
             "rows": 0}
        if V._publish_manifest(spark, t, m, proto):
            wins.append(i)

    threads = [th.Thread(target=commit, args=(i,)) for i in range(6)]
    for x in threads:
        x.start()
    for x in threads:
        x.join()
    assert len(wins) == 1
    published = V.list_versions(spark, t)
    assert len(published) == 1
    assert published[0]["data_dir"] == f"d{wins[0]}"


# ---------------------------------------------------------------------
# Racing-writers hypothesis test (VERDICT r3 directive 8): genuinely
# concurrent writers; the published history must be linearizable — a
# contiguous version chain where each version is explained by exactly
# one writer applied to its predecessor snapshot.
# ---------------------------------------------------------------------

_writers = st.lists(
    st.sampled_from(["overwrite", "append"]),
    min_size=2,
    max_size=4,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(modes=_writers)
def test_racing_writers_linearize(spark, tmp_path_factory, modes):
    t = str(tmp_path_factory.mktemp("vrace") / "tbl")
    V.write_versioned(
        spark, spark.createDataFrame([(0,)], "id long"), t, mode="overwrite"
    )
    errs = []

    def write(i, mode):
        try:
            df = spark.createDataFrame([((i + 1) * 1000,)], "id long")
            V.write_versioned(spark, df, t, mode=mode)
        except Exception as exc:  # pragma: no cover - failure detail
            errs.append(exc)

    threads = [
        threading.Thread(target=write, args=(i, m))
        for i, m in enumerate(modes)
    ]
    for x in threads:
        x.start()
    for x in threads:
        x.join()
    assert not errs
    manifests = V.list_versions(spark, t)
    # Contiguous chain: base + one commit per writer, ts monotonic.
    assert [m["version"] for m in manifests] == list(
        range(len(modes) + 1)
    )
    ts = [m["ts_ms"] for m in manifests]
    assert ts == sorted(ts) and len(set(ts)) == len(ts)
    snaps = [
        sorted(r.id for r in V.read_version(spark, t, version=v).collect())
        for v in range(len(modes) + 1)
    ]
    assert snaps[0] == [0]
    # Each version is exactly one writer's payload applied to its
    # predecessor (append = prev + payload, overwrite = payload), and
    # every writer explains exactly one version.
    unexplained = {(i, m) for i, m in enumerate(modes)}
    for v in range(1, len(snaps)):
        matches = [
            (i, m)
            for (i, m) in unexplained
            if (
                m == "append"
                and snaps[v] == sorted(snaps[v - 1] + [(i + 1) * 1000])
            )
            or (m == "overwrite" and snaps[v] == [(i + 1) * 1000])
        ]
        assert matches, f"version {v} ({snaps[v]}) explained by no writer"
        unexplained.discard(matches[0])
    assert not unexplained


def test_list_versions_batch_read(spark, tmp_path):
    """Histories past _BATCH_READ_MIN manifests read via one
    distributed wholeTextFiles job — same result as the sequential
    path (staged .tmp manifests excluded either way)."""
    t = str(tmp_path / "many")
    n = V._BATCH_READ_MIN + 6
    for v in range(n):
        assert V._publish_manifest(
            spark,
            t,
            {"version": v, "data_dir": f"d{v}", "ts_ms": v, "mode": "o",
             "rows": v},
        )
    got = V.list_versions(spark, t)
    assert [m["version"] for m in got] == list(range(n))
    assert [m["rows"] for m in got] == list(range(n))


def test_stale_lock_reclaim(spark, tmp_path):
    """A writer that died between lock claim and manifest rename must
    not block the table forever: the next writer reclaims a lock older
    than stale_lock_ms and commits normally."""
    from deftunes_spark.io import versioned as V

    path = str(tmp_path / "tbl")
    df = spark.range(3).toDF("id")
    assert V.write_versioned(spark, df, path) == 0

    # Simulate the crash: strand a lock for the NEXT version with an
    # old mtime and no manifest.
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/_manifests/.lock-" +
                                      f"{1:020d}.json")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    assert fs.createNewFile(p)
    now = int(jvm.System.currentTimeMillis())
    fs.setTimes(p, now - 600_000, -1)

    v = V.write_versioned(
        spark, spark.range(2).toDF("id"), path, mode="append",
        protocol=V.RenameCommitProtocol(stale_lock_ms=60_000),
    )
    assert v == 1
    assert V.read_version(spark, path).count() == 5
    # The reclaimed lock is gone after the successful publish.
    assert not fs.exists(p)


def test_fresh_lock_blocks_then_raises(spark, tmp_path):
    """A RECENT lock (a live writer mid-commit) is honored: the second
    writer treats the version as taken and, with the base never
    advancing, exhausts its retries with a clear error instead of
    double-committing."""
    import pytest as _pt

    from deftunes_spark.io import versioned as V

    path = str(tmp_path / "tbl")
    V.write_versioned(spark, spark.range(1).toDF("id"), path)
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(
        f"{path}/_manifests/.lock-{1:020d}.json"
    )
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    assert fs.createNewFile(p)  # fresh lock, held "right now"
    with _pt.raises(RuntimeError, match="commit race"):
        V.write_versioned(
            spark, spark.range(1).toDF("id"), path, max_retries=2
        )
    fs.delete(p, False)


def test_append_is_incremental_not_rewrite(spark, tmp_path):
    """An append must write ONLY the batch: the base version's data
    directory is shared (by reference) with the new version, never
    copied — the O(batch) property that makes daily increments viable
    on a 100 TB table."""
    from deftunes_spark.io import versioned as V

    path = str(tmp_path / "tbl")
    V.write_versioned(spark, spark.range(1000).toDF("id"), path)
    V.write_versioned(
        spark, spark.range(1000, 1010).toDF("id"), path, mode="append"
    )
    m0, m1 = V.list_versions(spark, path)
    d0, d1 = V._manifest_dirs(m0), V._manifest_dirs(m1)
    assert d1[:-1] == d0          # base dirs shared by reference
    assert len(d1) == len(d0) + 1  # plus exactly one batch dir
    # The new directory holds only the 10 appended rows.
    assert spark.read.parquet(d1[-1]).count() == 10
    assert m1["rows"] == 1010
    assert V.read_version(spark, path).count() == 1010
    # Retention is reference-counted: expiring v0 must NOT delete the
    # base dir v1 still references.
    assert V.expire_versions(spark, path, keep_last=1) == [0]
    assert V.read_version(spark, path).count() == 1010


def test_compact_versioned_folds_append_dirs(spark, tmp_path):
    """Compaction rewrites the multi-dir incremental snapshot into one
    right-sized dir AS a new version: same rows, fewer files, older
    snapshots still readable, and retention then drops the small
    files while the compacted version survives."""
    t = str(tmp_path / "tbl")
    V.write_versioned(spark, spark.range(100).toDF("id").repartition(8), t)
    for i in range(1, 4):
        V.write_versioned(
            spark,
            spark.range(100 * i, 100 * (i + 1)).toDF("id").repartition(8),
            t,
            mode="append",
        )
    stats = V.compact_versioned(spark, t, target_file_bytes=10**9)
    assert stats["base_version"] == 3 and stats["new_version"] == 4
    assert stats["files_after"] < stats["files_before"]
    assert sorted(r.id for r in V.read_version(spark, t).collect()) == list(
        range(400)
    )
    # Time travel through the compaction boundary still works.
    assert V.read_version(spark, t, version=2).count() == 300
    # The compaction is self-describing in the manifest.
    latest = V.list_versions(spark, t)[-1]
    assert latest["compaction_of"] == 3
    # Retention drops the pre-compaction versions; the compacted
    # snapshot (which shares NO dirs with them) stays whole.
    V.expire_versions(spark, t, keep_last=1)
    assert V.read_version(spark, t).count() == 400
    with pytest.raises(ValueError):
        V.read_version(spark, t, version=2)


def test_conditional_commit_conflict(spark, tmp_path):
    """require_base_version: a commit derived from a superseded
    snapshot must raise CommitConflict, not silently drop the
    interleaved append — the compaction/merge lost-update guard."""
    t = str(tmp_path / "tbl")
    V.write_versioned(spark, spark.range(10).toDF("id"), t)  # v0
    # A concurrent append lands AFTER the compactor read v0...
    V.write_versioned(
        spark, spark.range(10, 15).toDF("id"), t, mode="append"
    )  # v1
    with pytest.raises(V.CommitConflict):
        V.write_versioned(
            spark,
            spark.range(10).toDF("id"),
            t,
            require_base_version=0,
        )
    # Nothing was published by the conflicted writer and no orphan
    # data dir survived its cleanup.
    assert [m["version"] for m in V.list_versions(spark, t)] == [0, 1]
    assert V.read_version(spark, t).count() == 15
    # A commit asserting the CURRENT base succeeds.
    v = V.write_versioned(
        spark,
        spark.range(3).toDF("id"),
        t,
        require_base_version=1,
    )
    assert v == 2 and V.read_version(spark, t).count() == 3


def test_manifest_file_stats_pruned_read(spark, tmp_path):
    """Iceberg-style data skipping: appends record per-file min/max in
    their manifest; a pruned read scans only files whose range
    intersects the predicate — and stays a SUPERSET of the true
    result, with missing-stats dirs read conservatively."""
    t = str(tmp_path / "tbl")
    for lo in (0, 100, 200):  # disjoint id ranges, 4 files each
        V.write_versioned(
            spark,
            spark.range(lo, lo + 100).toDF("id").repartition(4),
            t,
            mode="overwrite" if lo == 0 else "append",
            stats_cols=["id"],
        )
    files, total = V.plan_pruned_files(spark, t, "id", lo=120, hi=180)
    assert total == 12
    assert len(files) < total  # pruning actually pruned
    got = sorted(
        r.id
        for r in V.read_version_pruned(spark, t, "id", 120, 180)
        .filter("id BETWEEN 120 AND 180")
        .collect()
    )
    assert got == list(range(120, 181))
    # Superset contract: unpruned files may carry extra rows, but
    # nothing in range may be lost — checked against the full read.
    full = sorted(
        r.id
        for r in V.read_version(spark, t)
        .filter("id BETWEEN 120 AND 180")
        .collect()
    )
    assert got == full
    # Open-ended bounds and fully-out-of-range predicates.
    all_rows = V.read_version_pruned(spark, t, "id", lo=250).count()
    assert all_rows == sum(
        1 for r in V.read_version(spark, t).collect() if r.id >= 250
    ) + len(
        [r for r in V.read_version_pruned(spark, t, "id", lo=250)
         .filter("id < 250").collect()]
    )
    none_files, _ = V.plan_pruned_files(spark, t, "id", lo=900, hi=999)
    assert none_files == []
    assert V.read_version_pruned(spark, t, "id", 900, 999).count() == 0
    # A dir written WITHOUT stats is always scanned (conservative).
    V.write_versioned(
        spark, spark.range(300, 310).toDF("id"), t, mode="append"
    )
    files2, total2 = V.plan_pruned_files(spark, t, "id", lo=120, hi=180)
    assert any(f.rstrip("/").startswith(t.rstrip("/")) for f in files2)
    got2 = (
        V.read_version_pruned(spark, t, "id", 120, 180)
        .filter("id BETWEEN 120 AND 180")
        .count()
    )
    assert got2 == 61


def test_vacuum_orphans(spark, tmp_path):
    """Only UNREFERENCED data dirs past the grace period are deleted:
    referenced dirs and fresh strandings survive, aged strandings go."""
    t = str(tmp_path / "tbl")
    V.write_versioned(spark, spark.range(5).toDF("id"), t)
    V.write_versioned(
        spark, spark.range(5, 8).toDF("id"), t, mode="append"
    )
    # Strand two dirs: a crashed writer's batch (aged) and a live
    # writer's batch (fresh mtime).
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(t).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    aged = f"{t}/_v9-deadbeef"
    fresh = f"{t}/_v9-cafebabe"
    spark.range(1).toDF("id").write.parquet(aged)
    spark.range(1).toDF("id").write.parquet(fresh)
    old = int(jvm.System.currentTimeMillis()) - 48 * 3600 * 1000
    fs.setTimes(jvm.org.apache.hadoop.fs.Path(aged), old, -1)

    deleted = V.vacuum_orphans(spark, t, grace_ms=3600 * 1000)
    assert len(deleted) == 1 and deleted[0].endswith("_v9-deadbeef")
    assert not fs.exists(jvm.org.apache.hadoop.fs.Path(aged))
    assert fs.exists(jvm.org.apache.hadoop.fs.Path(fresh))
    # The table itself is untouched.
    assert sorted(r.id for r in V.read_version(spark, t).collect()) == list(
        range(8)
    )
    assert V.read_version(spark, t, version=0).count() == 5


def test_delete_where_metadata_merge_on_read(spark, tmp_path):
    """Metadata delete: no data rewritten, readers filter at scan
    time, predicates accumulate, NULLs survive (SQL DELETE), history
    stays undeleted, and compaction folds the predicates away."""
    t = str(tmp_path / "tbl")
    rows = [(i, float(i) if i % 4 else None) for i in range(20)]
    V.write_versioned(
        spark, spark.createDataFrame(rows, "id long, v double"), t
    )
    v1 = V.delete_where(spark, t, "v > 14.0")  # NULL v rows survive
    assert v1 == 1
    got = sorted(r.id for r in V.read_version(spark, t).collect())
    assert got == [i for i in range(20) if i % 4 == 0 or i <= 14]
    # No data dir was written: same dirs as version 0.
    ms = V.list_versions(spark, t)
    assert V._manifest_dirs(ms[1]) == V._manifest_dirs(ms[0])
    assert ms[1]["rows"] == len(got)
    # History: version 0 still has everything.
    assert V.read_version(spark, t, version=0).count() == 20
    # Second delete stacks.
    V.delete_where(spark, t, "id < 2")
    got2 = sorted(r.id for r in V.read_version(spark, t).collect())
    assert got2 == [i for i in range(2, 20) if i % 4 == 0 or i <= 14]
    # Compaction materializes the filtered snapshot, predicate-free.
    V.compact_versioned(spark, t, target_file_bytes=10**9)
    latest = V.list_versions(spark, t)[-1]
    assert not latest.get("delete_predicates")
    assert sorted(r.id for r in V.read_version(spark, t).collect()) == got2


def test_delete_where_rewrite_and_conflict(spark, tmp_path):
    """Copy-on-write delete materializes now; racing any other commit
    surfaces CommitConflict instead of silently dropping it."""
    t = str(tmp_path / "tbl")
    V.write_versioned(spark, spark.range(10).toDF("id"), t)
    v = V.delete_where(spark, t, "id >= 8", strategy="rewrite")
    assert v == 1
    assert V.read_version(spark, t).count() == 8
    assert V.list_versions(spark, t)[-1]["rewrite_delete_of"] == "id >= 8"

    # Conflict: another writer advances the table mid-delete.
    import deftunes_spark.io.versioned as VV

    orig = VV.list_versions
    state = {"raced": False}

    def racing_list(spark_, path_):
        out = orig(spark_, path_)
        if not state["raced"] and path_ == t:
            state["raced"] = True
            V.write_versioned(
                spark, spark.range(100, 103).toDF("id"), t, mode="append"
            )
        return out

    VV.list_versions = racing_list
    try:
        with pytest.raises(V.CommitConflict):
            V.delete_where(spark, t, "id < 3")
    finally:
        VV.list_versions = orig
    # The interleaved append survived; the failed delete changed nothing.
    assert V.read_version(spark, t).count() == 11


def test_delete_predicates_compose_with_pruned_read(spark, tmp_path):
    """Merge-on-read deletes apply on the PRUNED read path too."""
    t = str(tmp_path / "tbl")
    V.write_versioned(
        spark,
        spark.range(100).toDF("id").repartition(4),
        t,
        stats_cols=["id"],
    )
    V.delete_where(spark, t, "id BETWEEN 40 AND 49")
    got = sorted(
        r.id
        for r in V.read_version_pruned(spark, t, "id", 30, 60)
        .filter("id BETWEEN 30 AND 60")
        .collect()
    )
    assert got == list(range(30, 40)) + list(range(50, 61))


def test_append_after_metadata_delete_no_resurrection(spark, tmp_path):
    """THE MOR-delete invariant (found by review, verified broken,
    now fixed): appends after a metadata delete must (a) NOT
    resurrect deleted rows — the predicate carries forward — and
    (b) NOT delete the newly appended rows even when they match the
    predicate — the predicate is scoped to the dirs that existed at
    delete time (Iceberg sequence-number semantics)."""
    t = str(tmp_path / "tbl")
    V.write_versioned(spark, spark.range(20).toDF("id"), t)
    V.delete_where(spark, t, "id >= 15")
    assert V.read_version(spark, t).count() == 15
    # Append rows 100-102 plus row 17 — 17 matches the old predicate
    # but is NEW data, so it must survive.
    V.write_versioned(
        spark,
        spark.createDataFrame([(100,), (101,), (102,), (17,)], "id long"),
        t,
        mode="append",
    )
    got = sorted(r.id for r in V.read_version(spark, t).collect())
    assert got == list(range(15)) + [17, 100, 101, 102]
    # Manifest row count agrees with the scan.
    assert V.list_versions(spark, t)[-1]["rows"] == len(got)
    # The exactly-once streaming sink appends through the same path —
    # one more append keeps the invariant.
    V.write_versioned(
        spark, spark.createDataFrame([(16,)], "id long"), t, mode="append"
    )
    got2 = sorted(r.id for r in V.read_version(spark, t).collect())
    assert got2 == sorted(got + [16])
    # And a FRESH delete applies to everything present now.
    V.delete_where(spark, t, "id >= 100")
    got3 = sorted(r.id for r in V.read_version(spark, t).collect())
    assert got3 == list(range(15)) + [16, 17]


def test_semantic_dedup_zero_norm_vectors_kept(spark):
    """Zero-norm embeddings (padding/failed-encoder rows) have
    undefined cosine: BOTH engines keep them and neither crashes
    (the expr path would raise DIVIDE_BY_ZERO under ANSI without the
    guard)."""
    from deftunes_spark.ext.curation import semantic_dedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),   # exact dup of 0
        (2, [0.0, 0.0, 0.0, 0.0]),   # zero vector
        (3, [0.0, 0.0, 0.0, 0.0]),   # another zero vector
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[0.0, 0.0, 0.0, 0.0]]
    for method in ("grouped", "expr"):
        got = {
            r.vec_id: r.kept
            for r in semantic_dedup(
                df, cents, threshold=0.9, method=method
            ).collect()
        }
        assert got == {0: True, 1: False, 2: True, 3: True}, method


def test_racing_deletes_and_appends_consistent_history(spark, tmp_path):
    """Concurrent appends (unconditional) and metadata deletes
    (conditional, app-level retry on CommitConflict) must leave a
    contiguous, metadata-consistent history: every version's manifest
    row count equals its actual scan, appends only grow content,
    deletes only shrink it — no resurrection, no lost append."""
    t = str(tmp_path / "tbl")
    V.write_versioned(spark, spark.range(10).toDF("id"), t)
    errs = []

    def appender(lo):
        try:
            V.write_versioned(
                spark,
                spark.range(lo, lo + 5).toDF("id"),
                t,
                mode="append",
            )
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    def deleter(cond):
        for _ in range(8):
            try:
                V.delete_where(spark, t, cond)
                return
            except V.CommitConflict:
                continue
            except Exception as exc:  # pragma: no cover
                errs.append(exc)
                return
        errs.append(RuntimeError(f"delete never committed: {cond}"))

    threads = [
        threading.Thread(target=appender, args=(100,)),
        threading.Thread(target=deleter, args=("id < 5",)),
        threading.Thread(target=appender, args=(200,)),
        threading.Thread(target=deleter, args=("id >= 205",)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    ms = V.list_versions(spark, t)
    assert [m["version"] for m in ms] == list(range(len(ms)))
    ts = [m["ts_ms"] for m in ms]
    assert ts == sorted(ts) and len(set(ts)) == len(ts)
    prev: set | None = None
    for m in ms:
        cur = {
            r.id
            for r in V.read_version(spark, t, version=m["version"]).collect()
        }
        assert m["rows"] == len(cur), f"v{m['version']} metadata drift"
        if prev is not None:
            if m["mode"] == "append":
                assert prev <= cur, f"v{m['version']} lost rows on append"
                assert len(cur) == len(prev) + 5
            elif m["mode"] == "delete":
                assert cur <= prev, f"v{m['version']} grew on delete"
        prev = cur
    # Both deletes committed and both appends landed: final content is
    # base minus id<5, plus both batches, minus id>=205.
    assert prev == set(range(5, 10)) | set(range(100, 105)) | {
        200, 201, 202, 203, 204,
    }
