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
import tempfile


def _root() -> str:
    root = os.path.join(
        tempfile.gettempdir(), f"deftunes_scratch_{os.getuid()}"
    )
    os.makedirs(root, mode=0o700, exist_ok=True)
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
