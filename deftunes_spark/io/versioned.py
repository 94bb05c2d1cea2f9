"""Versioned parquet tables: time travel + optimistic concurrency.

The reference's transform zone is an Iceberg v2 catalog
(terraform/assets/transform_jobs/de-c4w4a2-transform-json-job.py:156-187,
README.md:24); this container ships no Iceberg/Delta jars, so the two
user-visible guarantees that layer provided — read an OLD snapshot,
and let two writers race without corrupting the table — are rebuilt
here from first principles on plain parquet, the same way a table
format actually does it:

- **Immutable data versions.** Every commit writes a fresh data
  directory ``{path}/_v{N}/`` — files are never rewritten in place,
  so any published version stays readable forever (until expired).
- **Atomic manifest publication.** A version becomes visible only
  when ``{path}/_manifests/{N:020d}.json`` appears. The manifest is
  staged to a temp name and published with ``FileSystem.rename``,
  which is atomic and FAILS if the destination exists (the
  ``Path``-to-``Path`` contract on HDFS and local FS) — exactly the
  put-if-absent primitive Iceberg builds its commit on.
- **Optimistic concurrency.** Two writers both stage data for
  version N; the first rename wins, the loser observes the taken
  manifest, re-reads the latest version, and retries as N+1 (append
  re-derives from the new snapshot; overwrite just bumps). Bounded
  retries; losers clean up their orphaned staging dir.
- **Time travel.** ``read_version(path, version=...)`` or
  ``as_of_ts`` (manifest commit timestamps) resolves a snapshot and
  reads only its data directory. ``expire_versions`` is the
  retention pass (keep last K, never the current).

Object-store boundary (same as Iceberg's): S3 has no atomic exclusive
rename, so the single manifest-publish step is PLUGGABLE — a
``CommitProtocol`` provides the put-if-absent primitive. The default
(``RenameCommitProtocol``) is stage + atomic rename (HDFS/local);
``ConditionalPutCommitProtocol`` is the object-store shape: ONE
conditional write of the manifest payload (S3 ``If-None-Match: *``,
GCS ``if-generation-match: 0``, or a DynamoDB-style conditional
write), adapted through a user-supplied callable. Data files are
format-identical everywhere; only this one primitive varies.
"""

from __future__ import annotations

import json
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "_manifests"
_DATA_PREFIX = "_v"


class CommitProtocol:
    """The ONE primitive a table-format commit needs: publish
    ``payload`` at ``{mdir}/{name}`` iff nothing is there, atomically,
    reporting whether this writer won. Everything else in this module
    (immutable data dirs, retries, time travel) is store-agnostic."""

    def put_if_absent(
        self, spark: SparkSession, mdir: str, name: str, payload: bytes
    ) -> bool:
        raise NotImplementedError


class RenameCommitProtocol(CommitProtocol):
    """Claim the version with an atomic exclusive create of a LOCK
    file, then stage the payload to a temp name and rename it to the
    final name. The payload is never observable half-written: readers
    see the whole manifest or no manifest (lock/temp names are hidden
    from ``list_versions``).

    Why the lock: a bare exists-check + rename is check-then-act —
    Hadoop's LocalFileSystem rename follows POSIX semantics and
    OVERWRITES an existing destination, so two racing writers could
    both "win" the same version on ``file://`` paths (HDFS rename
    does fail on an existing destination, but the protocol must hold
    on both). ``FileSystem.createNewFile`` is atomic on local FS
    (O_EXCL) and HDFS (create with overwrite=false), giving a true
    single-winner claim.

    Crash boundary: a writer dying between claim and rename strands
    the lock; writers finding a lock older than ``stale_lock_ms``
    with no published manifest reclaim it. Reclaim is RENAME-to-claim
    (atomic single-winner: the stale lock is renamed to a
    reclaimer-unique name, and ``rename`` fails for every reclaimer
    after the first because the source is gone), then the canonical
    lock is re-established with another exclusive create — so a
    reclaimer also serializes against fresh claimers. After any
    claim, the owner writes its UUID into the lock and RE-READS it
    immediately before the manifest rename; a mismatch means the
    claim was stolen (a reclaimer decided this owner was dead) and
    the publish is abandoned as claim-lost. The residual window —
    lease-style — is an owner that stalls longer than
    ``stale_lock_ms`` mid-publish and resumes in the microseconds
    between a thief's verify and rename; a real multi-writer
    deployment on an object store should use
    ``ConditionalPutCommitProtocol`` with a server-side conditional
    put, which has no such window.

    Every JVM filesystem call in the claim path is treated as
    claim-lost on exception: Hadoop's LocalFileSystem
    ``createNewFile`` is exists-check-then-create (NOT a single
    O_EXCL syscall), so a simultaneous loser can surface
    ``FileAlreadyExistsException`` instead of returning False — that
    is a lost race, not an error, and must not escape to the caller."""

    def __init__(self, stale_lock_ms: int = 60_000) -> None:
        self._stale_ms = stale_lock_ms

    def _claim(self, spark, jvm, fs, mdir: str, name: str, lock) -> bool:
        """Become the single owner of ``lock``, or report lost."""
        if _excl_create(spark, fs, lock):
            return True
        # Claim failed. Either a live writer is mid-commit (its
        # manifest appears momentarily — we lost) or a crashed writer
        # stranded the lock: no manifest AND an old lock → reclaim.
        final = _p(jvm, f"{mdir}/{name}")
        try:
            age = _now_ms(spark) - fs.getFileStatus(
                lock
            ).getModificationTime()
            if fs.exists(final) or age < self._stale_ms:
                return False
            # Atomic single-winner among reclaimers: rename the stale
            # lock to a name only we know. Everyone else's rename
            # fails (source vanished).
            grave = _p(jvm, f"{mdir}/.reclaim-{uuid.uuid4().hex}")
            if not fs.rename(lock, grave):
                return False
            # Re-establish the canonical lock; a FRESH claimer may
            # have slipped in after our rename — then they own it.
            won = _excl_create(spark, fs, lock)
            try:
                fs.delete(grave, False)
            except Exception:
                pass  # orphan .reclaim-* is invisible to readers
            return won
        except Exception:
            return False  # lock vanished / racing reclaimer — lost

    def put_if_absent(
        self, spark: SparkSession, mdir: str, name: str, payload: bytes
    ) -> bool:
        jvm, fs = _fs(spark, mdir)
        fs.mkdirs(_p(jvm, mdir))
        final = _p(jvm, f"{mdir}/{name}")
        if fs.exists(final):
            return False
        lock = _p(jvm, f"{mdir}/.lock-{name}")
        if not self._claim(spark, jvm, fs, mdir, name, lock):
            return False
        token = uuid.uuid4().hex.encode("ascii")
        owned = True  # tracks whether the lock is still ours to clean
        try:
            # Stamp ownership into the (empty) lock we just created.
            # Overwrite is safe: we own it, and its mtime is fresh so
            # no reclaimer will touch it for stale_lock_ms.
            try:
                out = fs.create(lock, True)
                try:
                    out.write(token)
                finally:
                    out.close()
            except Exception:
                # Abandon the claim, but do NOT strand the lock we
                # just created: left in place (fresh mtime, no owner)
                # it would block every writer of this version for
                # stale_lock_ms while the caller's retry budget burns
                # out in seconds.
                owned = False
                try:
                    fs.delete(lock, False)
                except Exception:
                    pass
                return False
            if fs.exists(final):
                # Manifest landed between our exists-check and claim.
                return False
            tmp = _p(jvm, f"{mdir}/.tmp-{uuid.uuid4().hex}.json")
            out = fs.create(tmp, False)
            try:
                out.write(payload)
            finally:
                out.close()
            # Verify the claim is still ours right before publishing:
            # if a reclaimer stole the lock (we stalled past the
            # lease), its UUID is in the lock now — abandon, else our
            # rename could silently overwrite the thief's manifest
            # (LocalFileSystem rename clobbers existing destinations).
            if _read_small(fs, lock) != token:
                owned = False
                fs.delete(tmp, True)
                return False
            if fs.exists(final):  # paranoia: never clobber a manifest
                fs.delete(tmp, True)
                return False
            ok = fs.rename(tmp, final)
            if not ok:
                fs.delete(tmp, True)
            return bool(ok)
        finally:
            if owned:
                try:
                    # Release only OUR lock — a thief's lock (different
                    # token) must survive our cleanup.
                    if _read_small(fs, lock) == token:
                        fs.delete(lock, False)
                except Exception:
                    pass


class ConditionalPutCommitProtocol(CommitProtocol):
    """Object-store commit: a SINGLE conditional put of the manifest —
    no rename, no staging object. ``put_fn(key, payload) -> bool``
    adapts the store's create-if-absent (S3 ``PutObject`` +
    ``If-None-Match: *``, GCS ``if-generation-match: 0``, a DynamoDB
    ``attribute_not_exists`` write, ...); it must be all-or-nothing —
    on False/exception, nothing may be visible at ``key``.

    Without ``put_fn``, the fallback depends on the scheme:
    ``file://`` routes through java.nio ``Files.write`` with
    ``CREATE_NEW`` — a single O_EXCL open, exactly one winner —
    because Hadoop LocalFileSystem's ``create(path, overwrite=False)``
    is exists-check-then-create and double-succeeds under thread
    races (the same pathology ``_excl_create`` fixes for the rename
    protocol's lock claim). Other schemes use Hadoop exclusive
    ``create(path, False)``, which IS atomic on HDFS. A REAL object
    store must supply ``put_fn``, since S3A's create() is
    check-then-write, not conditional."""

    def __init__(
        self, put_fn: Callable[[str, bytes], bool] | None = None
    ) -> None:
        self._put_fn = put_fn

    def put_if_absent(
        self, spark: SparkSession, mdir: str, name: str, payload: bytes
    ) -> bool:
        key = f"{mdir}/{name}"
        if self._put_fn is not None:
            return bool(self._put_fn(key, payload))
        jvm, fs = _fs(spark, mdir)
        fs.mkdirs(_p(jvm, mdir))
        if fs.getUri().getScheme() == "file":
            # LocalFileSystem's create(path, False) is exists-check-
            # then-create — two racers can BOTH succeed. java.nio
            # CREATE_NEW maps to one O_EXCL open: exactly one winner.
            gw = spark.sparkContext._gateway
            p = jvm.java.io.File(
                _p(jvm, key).toUri().getPath()
            ).toPath()
            opts = gw.new_array(jvm.java.nio.file.OpenOption, 2)
            opts[0] = jvm.java.nio.file.StandardOpenOption.CREATE_NEW
            opts[1] = jvm.java.nio.file.StandardOpenOption.WRITE
            try:
                jvm.java.nio.file.Files.write(p, payload, opts)
                return True
            except Exception as exc:
                # Lost race ⇔ the CREATE_NEW open itself failed with
                # FileAlreadyExistsException — match the JAVA CLASS by
                # walking the cause chain, never the rendered message:
                # Py4J strings embed whole stack traces, so an
                # unrelated failure whose trace merely MENTIONS the
                # class name must NOT be misread as a lost race, or
                # the manifest write is silently dropped.
                if _java_exc_is(
                    exc, "java.nio.file.FileAlreadyExistsException"
                ):
                    return False  # lost the race — loser, not error
                # CREATE_NEW succeeded but the payload didn't land
                # whole: delete the partial before surfacing, per the
                # class contract that on failure nothing is visible.
                try:
                    jvm.java.nio.file.Files.deleteIfExists(p)
                except Exception:
                    pass
                raise
        try:
            out = fs.create(_p(jvm, key), False)  # exclusive create (HDFS)
        except Exception as exc:
            # Only a lost race (FileAlreadyExistsException) maps to
            # False; genuine IO/permission failures must surface, not
            # be retried as version bumps. Same class-not-message
            # discipline as the nio branch: a rendered Py4J trace that
            # merely MENTIONS 'exists' must not be misread as a loss.
            if _java_exc_is(
                exc, "org.apache.hadoop.fs.FileAlreadyExistsException"
            ) or _java_exc_is(
                exc, "java.nio.file.FileAlreadyExistsException"
            ):
                return False
            raise
        try:
            out.write(payload)
            out.close()
        except Exception:
            # The create succeeded but the payload didn't land whole:
            # a partial manifest at the canonical name would brick
            # every subsequent read AND this writer's own retry (its
            # next create sees 'exists' → misread as a lost race).
            # Delete the partial before surfacing — upholding the
            # class contract that on failure nothing is visible at
            # ``key``. (A hard process kill inside this window can
            # still strand a partial file — exactly why a REAL object
            # store must supply put_fn, whose conditional PUT is
            # all-or-nothing server-side.)
            try:
                out.close()
            except Exception:
                pass
            fs.delete(_p(jvm, key), False)
            raise
        return True


def _excl_create(spark, fs, path) -> bool:
    """Atomic exclusive create of an empty file: True iff THIS caller
    created it, False on any contention or failure.

    Hadoop's ``FileSystem.createNewFile`` is only atomic where the
    underlying store's create-no-overwrite is (HDFS). On
    LocalFileSystem it is exists-check-then-create over a plain
    ``FileOutputStream`` — two racers can interleave so BOTH observe
    success (reproduced under 6-thread contention) — so ``file://``
    paths route to ``java.nio.Files.createFile``, which maps to a
    single O_EXCL open and admits exactly one winner."""
    try:
        if fs.getUri().getScheme() == "file":
            jvm = spark._jvm
            gw = spark.sparkContext._gateway
            p = jvm.java.io.File(path.toUri().getPath()).toPath()
            attrs = gw.new_array(
                jvm.java.nio.file.attribute.FileAttribute, 0
            )
            jvm.java.nio.file.Files.createFile(p, attrs)
            return True
        return bool(fs.createNewFile(path))
    except Exception:
        return False  # exists / concurrent creator / IO — claim lost


def _java_exc_is(exc: Exception, class_name: str) -> bool:
    """True iff ``exc`` is a Py4J-surfaced Java exception whose class
    — or any class along its getCause() chain — is exactly
    ``class_name``. Message substrings are never consulted: Py4J
    renders full stack traces into ``str(exc)``, so an unrelated
    failure that merely MENTIONS the class name must not match."""
    je = getattr(exc, "java_exception", None)
    seen = 0
    while je is not None and seen < 16:  # cause chains are short
        try:
            if je.getClass().getName() == class_name:
                return True
            je = je.getCause()
        except Exception:
            return False
        seen += 1
    return False


def _read_small(fs, p) -> bytes | None:
    """Full bytes of a small control file, or None if unreadable
    (vanished / permission) — claim-verification treats None as
    not-ours."""
    try:
        stream = fs.open(p)
        try:
            return bytes(stream.readAllBytes())
        finally:
            stream.close()
    except Exception:
        return None


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(spark._jsc.hadoopConfiguration())


def _p(jvm, s: str):
    return jvm.org.apache.hadoop.fs.Path(s)


# Above this many manifests, list_versions reads them as ONE
# distributed job instead of one driver round-trip per file.
_BATCH_READ_MIN = 64


def list_versions(spark: SparkSession, path: str) -> list[dict]:
    """Published versions, ascending: [{version, ts_ms, mode, rows}].

    Small histories (the common case under ``expire_versions``
    retention) read sequentially on the driver; past
    ``_BATCH_READ_MIN`` manifests the read switches to a single
    ``wholeTextFiles`` job — O(1) driver round-trips instead of
    O(versions)."""
    jvm, fs = _fs(spark, path)
    mdir = _p(jvm, f"{path}/{_MANIFEST_DIR}")
    if not fs.exists(mdir):
        return []
    names = [
        st.getPath() for st in fs.listStatus(mdir)
        if st.getPath().getName().endswith(".json")
        and not st.getPath().getName().startswith(".")
    ]
    out = []
    if len(names) > _BATCH_READ_MIN:
        texts = spark.sparkContext.wholeTextFiles(
            f"{path}/{_MANIFEST_DIR}/*.json"
        ).values().collect()
        out = [json.loads(t) for t in texts]
    else:
        for p in names:
            stream = fs.open(p)
            try:
                raw = bytes(
                    stream.readAllBytes()
                )  # Hadoop 3 DataInputStream
            finally:
                stream.close()
            out.append(json.loads(raw.decode("utf-8")))
    return sorted(out, key=lambda m: m["version"])


def latest_version(spark: SparkSession, path: str) -> int | None:
    versions = list_versions(spark, path)
    return versions[-1]["version"] if versions else None


def _publish_manifest(
    spark, path: str, manifest: dict, protocol: CommitProtocol | None = None
) -> bool:
    """Publish via the commit protocol's put-if-absent.

    Returns False when another writer already published this version —
    the optimistic-concurrency signal.
    """
    protocol = protocol or RenameCommitProtocol()
    n = manifest["version"]
    return protocol.put_if_absent(
        spark,
        f"{path}/{_MANIFEST_DIR}",
        f"{n:020d}.json",
        json.dumps(manifest, sort_keys=True).encode("utf-8"),
    )


class CommitConflict(RuntimeError):
    """Raised when ``require_base_version`` no longer holds: another
    writer advanced the table between the caller's read and this
    commit. The caller's derived data is stale — re-derive and retry
    at the APPLICATION level (a blind protocol-level retry would
    publish results computed from a superseded snapshot)."""


def write_versioned(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    max_retries: int = 10,
    protocol: CommitProtocol | None = None,
    extra: dict | None = None,
    require_base_version: int | None = None,
    stats_cols: list[str] | None = None,
) -> int:
    """Commit ``df`` as a new table version; returns the version number.

    ``mode="overwrite"``: the new version IS ``df``.
    ``mode="append"``: the new version is previous-snapshot ∪ ``df``.
    Appends are INCREMENTAL, Iceberg-style: only the batch is written
    (one new data directory); the manifest's ``data_dirs`` lists the
    base snapshot's directories plus the new one, so an append costs
    O(batch) regardless of table size — a full-snapshot rewrite per
    daily increment would be O(store) and unusable at 100 TB. The
    dirs-list is re-derived from whatever snapshot is latest at
    (re)try time, so two concurrent appends serialize correctly
    instead of one clobbering the other.

    The input ``df`` is written exactly ONCE across all retry
    attempts (its content never depends on the base version — for
    append, only the manifest's dirs-list does); row counts come from
    parquet footer metadata plus the base manifest's count, never a
    full-snapshot pass.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unknown mode {mode!r}")
    if extra:
        # Validate BEFORE any data write: the clash is loop-invariant,
        # and failing after the batch has been written would orphan a
        # _v{n} dir no manifest references.
        clash = set(extra) & {
            "version", "data_dir", "data_dirs", "ts_ms", "mode", "rows",
            "file_stats", "delete_predicates",
        }
        if clash:
            raise ValueError(
                f"extra manifest keys clash with core fields: {clash}"
            )
    jvm, fs = _fs(spark, path)
    batch_dir: str | None = None  # df's data, written once, reused
    batch_rows: int | None = None
    batch_stats: dict | None = None
    for attempt in range(max_retries):
        if attempt:
            # Losing the race can mean "version claimed but manifest
            # not yet visible" (the winner is mid-publish, holding the
            # lock): without a pause, all retries burn in microseconds
            # inside that window and the writer gives up spuriously.
            # Short growing backoff lets the winner land its manifest
            # so the next attempt re-derives against the NEW snapshot.
            time.sleep(min(0.05 * attempt, 0.5))
        versions = list_versions(spark, path)
        base_m = versions[-1] if versions else None
        if require_base_version is not None:
            # Conditional commit (Iceberg's snapshot-id assertion):
            # the caller derived df from a specific snapshot; if the
            # table moved, publishing would silently drop the
            # interleaved commit (the compaction/merge lost-update).
            latest = base_m["version"] if base_m else None
            if latest != require_base_version:
                if batch_dir is not None:
                    fs.delete(_p(jvm, batch_dir), True)
                raise CommitConflict(
                    f"table {path} advanced to version {latest} "
                    f"(required base {require_base_version})"
                )
        prev_ts = base_m["ts_ms"] if base_m else -1
        n = 0 if base_m is None else base_m["version"] + 1
        # Commit timestamp is stamped per ATTEMPT (not once before the
        # retry loop) and clamped monotonic vs the predecessor manifest,
        # so a writer that loses the race can never publish a later
        # version with an earlier ts_ms — which would make as_of_ts_ms
        # time travel ambiguous. Iceberg likewise stamps at commit.
        ts_ms = max(prev_ts + 1, _now_ms(spark))
        if batch_dir is None:
            batch_dir = f"{path}/{_DATA_PREFIX}{n}-{uuid.uuid4().hex[:8]}"
            df.write.mode("overwrite").parquet(batch_dir)
            # Count from the written files — never a recompute of the
            # input plan. With stats_cols the per-file grouped scan
            # yields the count too (ONE pass, not two).
            if stats_cols:
                batch_stats, batch_rows = _collect_file_stats(
                    spark, batch_dir, stats_cols
                )
            else:
                batch_rows = spark.read.parquet(batch_dir).count()
        carried_preds = None
        if mode == "append" and base_m is not None:
            data_dirs = _manifest_dirs(base_m) + [batch_dir]
            rows = int(base_m["rows"]) + batch_rows
            # Merge-on-read deletes MUST survive appends: the base's
            # scoped predicates carry forward verbatim (their dir
            # scope excludes the new batch, so appended rows matching
            # an old predicate correctly survive — and deleted rows
            # stay deleted instead of resurrecting).
            carried_preds = base_m.get("delete_predicates") or None
        else:
            data_dirs = [batch_dir]
            rows = batch_rows
        manifest = {
            "version": n,
            # data_dir kept for backward-compat readers; data_dirs is
            # authoritative.
            "data_dir": batch_dir,
            "data_dirs": data_dirs,
            "ts_ms": ts_ms,
            "mode": mode,
            "rows": rows,
        }
        if stats_cols:
            # Per-file min/max of the declared columns — the
            # manifest-level data-skipping stats an Iceberg manifest
            # carries; read_version_pruned consumes them.
            manifest["file_stats"] = batch_stats
        if carried_preds:
            manifest["delete_predicates"] = carried_preds
        if extra:
            # Caller metadata rides the manifest (e.g. the streaming
            # sink's (stream_id, batch_id) for exactly-once replay
            # detection); clash-validated up front.
            manifest.update(extra)
        if _publish_manifest(spark, path, manifest, protocol):
            return n
        # Lost the race: the batch dir is base-independent — keep it
        # and retry with the NEW latest snapshot's dirs-list.
    if batch_dir is not None:
        fs.delete(_p(jvm, batch_dir), True)  # giving up — no orphan
    raise RuntimeError(
        f"write_versioned: lost the commit race {max_retries} times "
        f"on {path}"
    )


def _manifest_dirs(manifest: dict) -> list[str]:
    """Data directories of a snapshot; single-dir manifests written
    before the incremental-append format read as a 1-element list."""
    return list(manifest.get("data_dirs") or [manifest["data_dir"]])


def _now_ms(spark: SparkSession) -> int:
    # Driver clock via the JVM (keeps this module import-time safe in
    # restricted runtimes that stub Python time sources).
    return int(spark._jvm.System.currentTimeMillis())


def _resolve_version(
    versions: list[dict],
    path: str,
    version: int | None,
    as_of_ts_ms: int | None,
) -> dict:
    if not versions:
        raise FileNotFoundError(f"no published versions under {path}")
    if version is not None and as_of_ts_ms is not None:
        raise ValueError("pass version= or as_of_ts_ms=, not both")
    if version is not None:
        match = [m for m in versions if m["version"] == version]
        if not match:
            raise ValueError(
                f"version {version} not published (have "
                f"{[m['version'] for m in versions]})"
            )
        return match[0]
    if as_of_ts_ms is not None:
        eligible = [m for m in versions if m["ts_ms"] <= as_of_ts_ms]
        if not eligible:
            raise ValueError(
                f"no version at or before ts {as_of_ts_ms}"
            )
        return eligible[-1]
    return versions[-1]


def read_version(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    as_of_ts_ms: int | None = None,
) -> DataFrame:
    """Read a snapshot: explicit ``version``, or the newest manifest
    with ``ts_ms <= as_of_ts_ms`` (time travel), or latest."""
    versions = list_versions(spark, path)
    chosen = _resolve_version(versions, path, version, as_of_ts_ms)
    # mergeSchema: appends may add columns (unionByName semantics of
    # the old full-rewrite format) — older dirs surface NULLs for
    # columns they predate. Merge-on-read delete predicates (if any)
    # apply at scan time.
    return _apply_delete_predicates(
        spark.read.option("mergeSchema", "true").parquet(
            *_manifest_dirs(chosen)
        ),
        chosen,
    )


def _collect_file_stats(
    spark: SparkSession, batch_dir: str, stats_cols: list[str]
) -> tuple[dict, int]:
    """(per-file stats, total row count) for one data dir — per-file
    [min, max] of each stats column plus counts, all from ONE grouped
    scan of the just-written files (driver memory is O(files × cols);
    a real deployment would spill these to an avro/parquet manifest
    file, same information).

    Values must round-trip JSON: numeric and string columns only
    (timestamps/dates should be written as epoch numbers upstream).
    An all-null file records [None, None] and is never pruned."""
    df = spark.read.parquet(batch_dir)

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in stats_cols:
        aggs.append(F.min(c).alias(f"__mn_{c}"))
        aggs.append(F.max(c).alias(f"__mx_{c}"))
    rows = (
        df.groupBy(F.input_file_name().alias("__f"))
        .agg(*aggs)
        .collect()
    )
    out: dict[str, dict] = {}
    total = 0
    for r in rows:
        total += int(r["__n"])
        out[r["__f"]] = {
            c: [r[f"__mn_{c}"], r[f"__mx_{c}"]] for c in stats_cols
        }
    return out, total


def read_version_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    lo=None,
    hi=None,
    version: int | None = None,
    as_of_ts_ms: int | None = None,
) -> DataFrame:
    """Snapshot read with MANIFEST-LEVEL data skipping: only files
    whose recorded [min, max] range for ``col`` intersects
    ``[lo, hi]`` are scanned — Iceberg's file pruning, the layer that
    turns a 100 TB table scan into a read of the few files a selective
    predicate can touch BEFORE the engine's own row-group pruning even
    starts. Conservative everywhere stats are missing: a dir written
    without ``stats_cols``, a file with no entry for ``col``, or an
    all-null range is always read.

    The caller still applies the actual row filter — pruning is a
    superset guarantee, not a filter (exactly Iceberg's contract).
    ``plan_pruned_files`` exposes the decision for tests/EXPLAIN-style
    audits."""
    # ONE manifest listing serves both the file plan and the delete
    # predicates — two listings would double manifest I/O and could
    # resolve different snapshots if a commit landed in between.
    versions = list_versions(spark, path)
    chosen = _resolve_version(versions, path, version, as_of_ts_ms)
    files, _total = _plan_pruned(versions, chosen, col, lo, hi)
    if not files:
        return _apply_delete_predicates(
            spark.read.option("mergeSchema", "true")
            .parquet(*_manifest_dirs(chosen))
            .filter(F.lit(False)),
            chosen,
        )
    return _apply_delete_predicates(
        spark.read.option("mergeSchema", "true").parquet(*files), chosen
    )


def plan_pruned_files(
    spark: SparkSession,
    path: str,
    col: str,
    lo=None,
    hi=None,
    version: int | None = None,
    as_of_ts_ms: int | None = None,
) -> tuple[list[str], int]:
    """(paths to scan, total candidate count) for a pruned read.

    Stats travel with the manifest that INTRODUCED each data dir
    (dirs are immutable, so the mapping dir → stats never goes
    stale); a retained version whose introducing manifest was expired
    falls back to scanning that dir whole."""
    versions = list_versions(spark, path)
    chosen = _resolve_version(versions, path, version, as_of_ts_ms)
    return _plan_pruned(versions, chosen, col, lo, hi)


def _plan_pruned(
    versions: list[dict], chosen: dict, col: str, lo, hi
) -> tuple[list[str], int]:
    dir_stats: dict[str, dict] = {}
    for m in versions:
        st = m.get("file_stats")
        if st is not None:
            dir_stats[m["data_dir"]] = st
    files: list[str] = []
    total = 0
    for d in _manifest_dirs(chosen):
        st = dir_stats.get(d)
        if st is None:
            files.append(d)  # no stats — scan the dir whole
            total += 1
            continue
        for f, cols in st.items():
            total += 1
            rng = cols.get(col)
            if rng is None or rng[0] is None or rng[1] is None:
                files.append(f)
                continue
            mn, mx = rng
            try:
                keep = (lo is None or mx >= lo) and (
                    hi is None or mn <= hi
                )
            except TypeError:
                # JSON-round-tripped stats can disagree in type with
                # the caller's bounds (string stats vs numeric lo/hi);
                # conservative-everywhere: scan the file rather than
                # fail the read.
                keep = True
            if keep:
                files.append(f)
    return files, total


def compact_versioned(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    protocol: CommitProtocol | None = None,
    stats_cols: list[str] | str | None = "auto",
) -> dict:
    """Rewrite the LATEST snapshot into ~``target_file_bytes`` files
    and commit the rewrite as a NEW version — Iceberg's
    ``rewrite_data_files``, the compaction half of versioned-table
    maintenance (``expire_versions`` is the retention half).

    Incremental appends accrete one directory per batch; a 15-minute
    ingest cadence is ~35k directories/year whose file listing and
    task scheduling eventually dominate scans. Compaction folds them
    back into one right-sized directory. Safety comes from the commit
    protocol itself:

    - readers never see a half-compacted table (a version is visible
      only at manifest publish);
    - time travel to pre-compaction versions keeps working — their
      manifests still reference the old dirs, which
      ``expire_versions``' reference counting retains until those
      versions expire;
    - a CONCURRENT append cannot be silently dropped: the commit
      asserts the base snapshot (``require_base_version``), so if the
      table advanced while the rewrite ran, ``CommitConflict`` is
      raised and the compaction simply reruns later — losing a
      compaction is free, losing an append is not.

    Returns {base_version, new_version, files_before, files_after,
    bytes}."""
    versions = list_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no published versions under {path}")
    base = versions[-1]
    jvm, fs = _fs(spark, path)
    total_bytes = 0
    files_before = 0
    for d in _manifest_dirs(base):
        try:
            summary = fs.getContentSummary(_p(jvm, d))
        except Exception:
            continue  # dir expired between list and summary — skip
        total_bytes += summary.getLength()
        files_before += summary.getFileCount()
    n_files = max(1, -(-total_bytes // max(1, target_file_bytes)))
    df = read_version(spark, path, version=base["version"])
    if stats_cols == "auto":
        # Preserve data skipping through the rewrite: recompute stats
        # for every column the base snapshot tracked (otherwise the
        # compacted manifest would have no file_stats and every pruned
        # read silently degrades to a full scan). Intersect with the
        # snapshot's live schema — a column tracked by an old manifest
        # but dropped by a later overwrite would make
        # _collect_file_stats aggregate a nonexistent column and fail
        # the whole compaction with AnalysisException.
        cols: set[str] = set()
        for m in versions:
            for file_cols in (m.get("file_stats") or {}).values():
                cols.update(file_cols)
        cols &= set(df.columns)
        stats_cols = sorted(cols) or None
    df = df.repartition(n_files)
    new_v = write_versioned(
        spark,
        df,
        path,
        mode="overwrite",
        protocol=protocol,
        extra={"compaction_of": base["version"]},
        require_base_version=base["version"],
        stats_cols=stats_cols,
    )
    new_m = [
        m for m in list_versions(spark, path) if m["version"] == new_v
    ][0]
    files_after = 0
    for d in _manifest_dirs(new_m):
        try:
            files_after += fs.getContentSummary(_p(jvm, d)).getFileCount()
        except Exception:
            continue  # concurrent cleanup — stats only, commit stands
    return {
        "base_version": base["version"],
        "new_version": new_v,
        "files_before": int(files_before),
        "files_after": int(files_after),
        "bytes": int(total_bytes),
    }


def delete_where(
    spark: SparkSession,
    path: str,
    condition: str,
    strategy: str = "metadata",
    protocol: CommitProtocol | None = None,
) -> int:
    """Row-level DELETE on a versioned table; returns the new version.

    ``strategy="metadata"`` is merge-on-read (Iceberg v2's delete
    shape at predicate granularity): NO data is rewritten — the new
    manifest references the SAME data dirs plus the predicate, and
    readers apply ``NOT coalesce(condition, false)`` at scan time
    (SQL DELETE semantics: NULL-evaluating rows survive). O(metadata)
    commit cost regardless of table size — the only viable shape for
    a daily GDPR pass over 100 TB. Accumulated predicates fold away at
    the next ``compact_versioned`` (which materializes the filtered
    read and publishes a predicate-free snapshot) — exactly the
    MOR→COW folding Iceberg's rewrite procedures do.

    ``strategy="rewrite"`` is copy-on-write: materialize the filtered
    snapshot as a fresh version now (costs a table rewrite; reads pay
    nothing afterward).

    Both serialize against concurrent writers with the conditional
    commit: a delete races an append for CORRECTNESS (the append may
    add rows the predicate should remove), so losing the race raises
    ``CommitConflict`` for the caller to re-run against the new
    snapshot — serializable-isolation behavior, not blind retry.

    Time travel is unaffected: versions before the delete keep their
    undeleted content."""
    if strategy not in ("metadata", "rewrite"):
        raise ValueError(f"unknown strategy {strategy!r}")
    versions = list_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no published versions under {path}")
    base = versions[-1]
    keep = ~F.coalesce(F.expr(condition), F.lit(False))
    if strategy == "rewrite":
        df = read_version(spark, path, version=base["version"]).filter(
            keep
        )
        return write_versioned(
            spark,
            df,
            path,
            mode="overwrite",
            protocol=protocol,
            extra={"rewrite_delete_of": condition},
            require_base_version=base["version"],
        )
    # Metadata-only: one count job (for the manifest's rows field),
    # then a manifest publish referencing the base's dirs verbatim.
    # The predicate is SCOPED to the data dirs that exist NOW —
    # Iceberg's sequence-number rule: a delete applies to files
    # already in the table, never to rows appended later (without the
    # scope, the next append would re-apply every historical predicate
    # to its fresh rows — and conversely, carrying nothing forward
    # would resurrect deleted rows; both are wrong).
    remaining = int(
        read_version(spark, path, version=base["version"])
        .filter(keep)
        .count()
    )
    n = base["version"] + 1
    manifest = {
        "version": n,
        "data_dir": base["data_dir"],
        "data_dirs": _manifest_dirs(base),
        "ts_ms": max(base["ts_ms"] + 1, _now_ms(spark)),
        "mode": "delete",
        "rows": remaining,
        "delete_predicates": list(base.get("delete_predicates") or [])
        + [{"sql": condition, "dirs": _manifest_dirs(base)}],
    }
    # Transient claim contention (a winner mid-publish holding the
    # lock) is NOT a conflict: retry while the base is unchanged, and
    # only report CommitConflict when the table genuinely advanced.
    for attempt in range(10):
        if attempt:
            time.sleep(min(0.05 * attempt, 0.5))
            latest = latest_version(spark, path)
            if latest != base["version"]:
                raise CommitConflict(
                    f"table {path} advanced to version {latest} during "
                    f"delete (base {base['version']}) — re-derive and "
                    "re-run"
                )
        if _publish_manifest(spark, path, manifest, protocol):
            return n
    raise RuntimeError(
        f"delete_where: could not publish version {n} on {path} "
        "(persistent lock contention)"
    )


def _apply_delete_predicates(df: DataFrame, manifest: dict) -> DataFrame:
    """Merge-on-read: filter out every accumulated delete predicate
    (NULL-evaluating rows survive, matching SQL DELETE).

    Each predicate is scoped to the data dirs present when the delete
    committed (``input_file_name`` provenance), so rows APPENDED after
    the delete survive even when they match its condition — Iceberg's
    sequence-number semantics. Legacy unscoped (plain-string)
    predicates apply globally."""
    preds = manifest.get("delete_predicates") or []
    if not preds:
        return df
    df = df.withColumn("__vfile", F.input_file_name())
    for p in preds:
        if isinstance(p, str):  # legacy unscoped form
            cond = F.coalesce(F.expr(p), F.lit(False))
            df = df.filter(~cond)
            continue
        cond = F.coalesce(F.expr(p["sql"]), F.lit(False))
        in_scope = F.lit(False)
        for d in p.get("dirs") or []:
            # input_file_name yields a URI (file:/...); dirs are the
            # manifest's raw paths — match on the path tail.
            tail = d.rstrip("/").rsplit("/", 1)[-1]
            in_scope = in_scope | F.col("__vfile").contains(
                f"/{tail}/"
            )
        df = df.filter(~(cond & in_scope))
    return df.drop("__vfile")


def vacuum_orphans(
    spark: SparkSession,
    path: str,
    grace_ms: int = 24 * 3600 * 1000,
) -> list[str]:
    """Delete data directories no manifest references — the strandings
    of writers that crashed between batch write and manifest publish
    (Delta ``VACUUM`` / Iceberg ``remove_orphan_files``). Without this
    pass a busy table slowly leaks its crashed writers' batches.

    ``grace_ms`` guards the race against LIVE writers: a writer that
    has written its batch dir but not yet published would look like an
    orphan, so only dirs older than the grace period (default 24 h —
    far beyond any commit's retry budget) are eligible. Returns the
    deleted directory paths."""
    jvm, fs = _fs(spark, path)
    root = _p(jvm, path)
    if not fs.exists(root):
        return []
    referenced: set[str] = set()
    for m in list_versions(spark, path):
        referenced.update(
            d.rstrip("/").rsplit("/", 1)[-1] for d in _manifest_dirs(m)
        )
    now = _now_ms(spark)
    deleted: list[str] = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith(_DATA_PREFIX) or name in referenced:
            continue
        if now - st.getModificationTime() < grace_ms:
            continue  # possibly a live writer mid-commit
        try:
            fs.delete(st.getPath(), True)
            deleted.append(str(st.getPath()))
        except Exception:
            continue  # contested/already gone — next pass gets it
    # Aged .reclaim-* graves: a lock reclaimer that crashed between
    # rename(lock, grave) and delete(grave) leaks the grave file
    # forever (it is invisible to readers and to the _v* scan above).
    mroot = _p(jvm, f"{path}/{_MANIFEST_DIR}")
    if fs.exists(mroot):
        for st in fs.listStatus(mroot):
            name = st.getPath().getName()
            if not name.startswith(".reclaim-"):
                continue
            if now - st.getModificationTime() < grace_ms:
                continue
            try:
                fs.delete(st.getPath(), False)
                deleted.append(str(st.getPath()))
            except Exception:
                continue
    return deleted


def expire_versions(
    spark: SparkSession, path: str, keep_last: int = 2
) -> list[int]:
    """Retention: delete manifests of all but the newest ``keep_last``
    versions (never the current), plus every data directory no
    RETAINED version still references — incremental appends share
    directories across versions, so deletion is reference-counted,
    not per-manifest. Returns expired version numbers. The
    snapshot-expiry half of table maintenance (compaction being the
    other — ``ext.layout``)."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = list_versions(spark, path)
    jvm, fs = _fs(spark, path)
    retained_dirs: set[str] = set()
    for m in versions[-keep_last:]:
        retained_dirs.update(_manifest_dirs(m))
    expired = []
    for m in versions[:-keep_last]:
        for d in _manifest_dirs(m):
            if d not in retained_dirs:
                fs.delete(_p(jvm, d), True)
        fs.delete(
            _p(jvm, f"{path}/{_MANIFEST_DIR}/{m['version']:020d}.json"),
            True,
        )
        expired.append(m["version"])
    return expired
