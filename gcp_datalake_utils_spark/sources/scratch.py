"""Pid-scoped /tmp scratch directories for the [Q] queries that
materialize a store (snapshots, schema evolution, bucketed layouts).

Contract (review-hardened):

- the path carries the pid, so concurrent processes (the driver's
  correctness gate next to a local bench/pytest over the same sf_dir)
  can never rmtree each other's store mid-read;
- cleanup is registered ONCE per directory via atexit, so a process
  exit leaves nothing behind;
- before creating, sibling directories whose owning pid is dead are
  swept — orphans from a crashed/killed process (where atexit never
  ran) do not accumulate across runs.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import time

_REGISTERED: set[str] = set()


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # alive, owned by another user
    return True


# Minimum age before an apparently-dead sibling is swept. os.kill(pid, 0)
# checks liveness in THIS process's PID namespace: with /tmp shared across
# namespaces (containerized bench next to a host driver), a live foreign
# process can look dead, and PID reuse can make a true orphan look alive.
# The age floor bounds but does not eliminate the risk: a dir's mtime only
# changes when its direct children change (reads never bump it), so a
# foreign owner that created its store >1h ago and is still reading it
# could in principle still be swept. To keep live owners out of the
# window, every pid_scratch() call refreshes the mtime of ALL scratch
# dirs owned by this process (see the os.utime loop below) — an engine
# process that is still making queries never ages past the floor.
_SWEEP_MIN_AGE_S = 3600.0


def _sweep_orphans(parent: str) -> None:
    """Remove sibling scratch dirs whose `-<pid>` suffix names a dead
    process (their atexit hook never ran) AND whose mtime is older than
    ``_SWEEP_MIN_AGE_S`` (cross-PID-namespace / PID-reuse guard)."""
    try:
        names = os.listdir(parent)
    except FileNotFoundError:
        return
    now = time.time()
    for name in names:
        pid_s = name.rsplit("-", 1)[-1]
        if not pid_s.isdigit() or int(pid_s) == os.getpid():
            continue
        path = os.path.join(parent, name)
        try:
            age = now - os.stat(path).st_mtime
        except OSError:
            continue
        if age >= _SWEEP_MIN_AGE_S and not _pid_alive(int(pid_s)):
            shutil.rmtree(path, ignore_errors=True)


def pid_scratch(root: str, key: str) -> str:
    """Fresh per-(key, pid) scratch dir under ``root``: wiped on every
    call (repeat runs within a process are reproducible), removed at
    process exit, dead-pid siblings swept."""
    d = os.path.join(
        root, f"{hashlib.md5(key.encode()).hexdigest()[:12]}-{os.getpid()}")
    _sweep_orphans(root)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    if d not in _REGISTERED:
        _REGISTERED.add(d)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    # keep this process's live stores outside the sweep age window:
    # reads don't bump a dir's mtime, so refresh it explicitly on every
    # scratch call (any query activity renews ALL of our stores)
    for own in _REGISTERED:
        try:
            os.utime(own)
        except OSError:
            pass
    return d
