"""Bounded per-process scratch directories for query-local tables.

Several driver queries materialize an intermediate table (a bucketed
edge list, an exported shard set, a streaming source copy) under /tmp.
A fresh ``mkdtemp`` per invocation leaks one directory per call —
bench sweeps re-invoke builders 6-10 times per query, so repeated
sweeps accumulate unboundedly (r11/r12 advice). A FIXED path shared
across processes is the other failure mode: two concurrent harness
processes (the driver benches at two core counts) would rmtree each
other's live files, and a predictable /tmp name can be pre-created by
another user (r11 advice on the e2e export).

``scratch_dir`` gives the middle ground:

- rooted at ``$TMPDIR/deftunes_scratch_<uid>`` created with mode 0700
  (per-user owned — no foreign pre-created path is followed);
- one subdirectory per (purpose, key, PID) — stable within a process,
  so repeated invocations of the same query overwrite instead of
  accumulate, and concurrent PROCESSES never share a path;
- on every call, sibling directories of the same purpose whose PID is
  dead are removed — so the steady state is one live copy per
  (purpose, key, running process), regardless of how many sweeps ran.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import stat
import tempfile


def _root() -> str:
    root = os.path.join(
        tempfile.gettempdir(), f"deftunes_scratch_{os.getuid()}"
    )
    os.makedirs(root, mode=0o700, exist_ok=True)
    # makedirs(exist_ok=True) accepts a PRE-EXISTING path without any
    # ownership check — on a shared /tmp another user could pre-create
    # the predictable name as a symlink or a world-writable dir, and
    # the rmtree/parquet writes below would follow it (r13 advice: the
    # exact hole this module exists to close). Verify the tempfile-
    # style secure-dir properties on every call: a real directory (not
    # a symlink — lstat), owned by us, no group/other write bits.
    st = os.lstat(root)
    if (
        not stat.S_ISDIR(st.st_mode)
        or st.st_uid != os.getuid()
        or st.st_mode & (stat.S_IWGRP | stat.S_IWOTH)
    ):
        raise RuntimeError(
            f"scratch root {root!r} is not a private directory owned "
            f"by uid {os.getuid()} (mode {oct(st.st_mode)}, uid "
            f"{st.st_uid}) — refusing to use it"
        )
    return root


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def scratch_dir(purpose: str, key: str, wipe: bool = True) -> str:
    """Return an existing empty scratch directory for (purpose, key),
    unique to this process.

    ``wipe=True`` (default) clears the directory first — callers that
    re-invoke per run get overwrite semantics. ``wipe=False`` keeps
    prior contents (for per-session memoized tables whose caller
    guards the build itself). Dead-PID siblings of the same purpose
    are garbage-collected on every call.

    Assumptions (r13 advice, recorded): the path is unique per
    (purpose, key, PID) — one invocation of a given query at a time
    per process; a threaded harness invoking the same query
    concurrently in one process would share (and wipe) the same path.
    PID-liveness GC can be fooled by PID reuse into keeping a dead
    sibling alive; with every current caller using ``wipe=True`` the
    worst case is a stale directory surviving until its PID slot is
    truly free, never stale contents being read.
    """
    root = _root()
    khash = hashlib.md5(key.encode()).hexdigest()[:10]
    prefix = f"{purpose}-"
    for entry in os.listdir(root):
        if not entry.startswith(prefix):
            continue
        parts = entry.rsplit("-", 1)
        try:
            pid = int(parts[-1])
        except ValueError:
            continue
        if not _pid_alive(pid):
            shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
    path = os.path.join(root, f"{purpose}-{khash}-{os.getpid()}")
    if wipe:
        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, mode=0o700, exist_ok=True)
    return path
