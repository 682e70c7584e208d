"""Versioned parquet store with an atomic manifest pointer: snapshot
isolation for concurrent readers without a table format.

The plain serving-store swap (fraud.py ``_swap_parquet``, serving.py
expiry/compaction) is crash-safe but not reader-atomic: between rmtree
and rename the path does not exist. This store closes that gap the way
Delta/Iceberg do, minus the format: every write lands in a NEW version
directory (``v_00000001``, ``v_00000002``, ...) and readers resolve the
current version through a one-line ``MANIFEST`` file that is updated with
``os.replace`` — atomic on POSIX — so a reader sees either the old
version or the new one, never a missing or half-written store. Old
versions stay on disk (still readable by in-flight queries) until
``gc_versions`` reclaims them.

Contract and limits, honestly: optimistic single-committer (concurrent
writers are SAFE but one loses — ``commit_version`` compare-and-swaps the
manifest against the parent version it read, so a racing commit raises
``ConcurrentCommitError`` instead of silently discarding the other
writer's version; retry by re-reading and re-committing. Real multi-writer
MERGE needs a table format's commit protocol). Readers must resolve the
manifest at query START and not re-resolve mid-query; GC must keep at
least as many versions as the longest-running reader. That is exactly the
snapshot/GC discipline Delta calls VACUUM retention, and the CAS mirrors
the reference's DynamoDB conditional-write PUT path
(lambda_app/api/function.py:29-34).
"""

from __future__ import annotations

import fcntl
import os
import time
import shutil
import tempfile
from typing import Callable, Union

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "MANIFEST"
_STAGE_LOCK = ".STAGE_LOCK"
# gc skips stage locks younger than this: covers the writer's
# os.open(O_CREAT)->flock gap (microseconds) with huge margin while
# delaying dead-stage reclamation by only a minute.
_STAGE_GC_GRACE_S = 60.0
_UNSET = object()


class ConcurrentCommitError(RuntimeError):
    """The manifest moved between reading the parent version and the
    pointer flip — another writer committed first. Re-read and retry."""


def _versions(root: str) -> list[str]:
    if not os.path.isdir(root):
        return []
    return sorted(
        d for d in os.listdir(root)
        if d.startswith("v_") and os.path.isdir(os.path.join(root, d))
    )


def current_version(root: str) -> str | None:
    """The version directory name the manifest points at, or None for an
    empty store."""
    path = os.path.join(root, _MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return fh.read().strip() or None


def commit_version(
    df: DataFrame, root: str, expected_parent: str | None | object = _UNSET
) -> str:
    """Write ``df`` as the next version and atomically repoint the
    manifest. Returns the new version's directory path. Safe against
    crashes at any point: an unreferenced ``v_N`` dir (crash before the
    manifest flip) is invisible to readers and reclaimed by the next
    ``gc_versions``.

    Optimistic concurrency: the pointer flip is a compare-and-swap
    against ``expected_parent`` — the version this commit builds on
    (default: the manifest at entry). If another writer committed in
    between, the flip raises ``ConcurrentCommitError`` (the staged dir is
    removed) instead of silently discarding that commit; callers retry by
    re-reading the store and re-committing (``commit_with_retry`` wraps
    that loop). The CAS critical section is an ``flock`` on
    ``.COMMIT_LOCK`` — kernel-released on writer death, so no stale-lock
    recovery is needed.

    Staging and numbering (round-9 hardening): the parquet write lands in
    a hidden ``.stage_*`` dir — invisible to ``_versions``, readers, and
    ``gc_versions`` — and the version NUMBER is allocated only inside the
    ``.COMMIT_LOCK`` critical section, immediately before the
    rename-into-place. That makes ``v_N`` order identical to commit order
    (a CAS loser never takes, then frees, a number a later commit could
    re-issue out of order), and gc can never reclaim an in-flight stage:
    a live writer holds the stage's own ``flock`` for its whole life, so
    gc only removes stage dirs whose lock is acquirable (writer dead)."""
    os.makedirs(root, exist_ok=True)
    if expected_parent is _UNSET:
        expected_parent = current_version(root)
    sdir = tempfile.mkdtemp(prefix=".stage_", dir=root)
    stage_fd = os.open(os.path.join(sdir, _STAGE_LOCK), os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(stage_fd, fcntl.LOCK_EX)
        df.write.mode("append").parquet(sdir)
        lock_fd = os.open(
            os.path.join(root, ".COMMIT_LOCK"), os.O_CREAT | os.O_RDWR
        )
        try:
            fcntl.flock(lock_fd, fcntl.LOCK_EX)
            cur = current_version(root)
            if cur != expected_parent:
                shutil.rmtree(sdir, ignore_errors=True)
                raise ConcurrentCommitError(
                    f"manifest moved: expected parent {expected_parent!r}, "
                    f"found {cur!r} — another writer committed first"
                )
            # version number allocated UNDER the lock: monotone with
            # commit order by construction
            vs = _versions(root)
            nxt = (int(vs[-1][2:]) + 1) if vs else 1
            vdir = os.path.join(root, f"v_{nxt:08d}")
            os.rename(sdir, vdir)
            try:
                os.unlink(os.path.join(vdir, _STAGE_LOCK))
            except OSError:
                pass  # hidden file; parquet readers skip it anyway
            tmp = os.path.join(root, f".{_MANIFEST}.tmp")
            with open(tmp, "w") as fh:
                fh.write(os.path.basename(vdir))
            os.replace(tmp, os.path.join(root, _MANIFEST))  # atomic flip
        finally:
            fcntl.flock(lock_fd, fcntl.LOCK_UN)
            os.close(lock_fd)
    finally:
        fcntl.flock(stage_fd, fcntl.LOCK_UN)
        os.close(stage_fd)
    return vdir


def commit_with_retry(
    df: Union[DataFrame, Callable[[str | None], "DataFrame | None"]],
    root: str,
    max_retries: int = 5,
) -> str | None:
    """Bounded OCC retry loop around ``commit_version`` — the pattern
    every foreachBatch sink caller needs, packaged (round-8 verdict #6).

    Each attempt re-reads the manifest as the parent and commits against
    it; on ``ConcurrentCommitError`` it retries, up to ``max_retries``
    attempts total, then re-raises the last error. For blind snapshot
    appends pass the DataFrame; for read-modify-write commits pass a
    callable ``parent_version -> DataFrame | None`` so the frame is
    rebuilt against the fresh snapshot each attempt (committing a stale
    read-modify-write would silently undo the racing writer's rows) —
    read the parent via ``read_version(spark, root, parent)``, not
    ``read_current``, so the frame and the CAS agree on the snapshot. A
    callable may return ``None`` to abort: nothing is committed and the
    function returns ``None`` (e.g. a TTL sweep that found nothing
    expired in the current snapshot)."""
    if max_retries < 1:
        raise ValueError("max_retries must be >= 1")
    last: ConcurrentCommitError | None = None
    for _ in range(max_retries):
        parent = current_version(root)
        frame = df(parent) if callable(df) else df
        if frame is None:
            return None
        try:
            return commit_version(frame, root, expected_parent=parent)
        except ConcurrentCommitError as exc:
            last = exc
    raise last  # type: ignore[misc]  # loop ran >= 1 time


def read_current(spark: SparkSession, root: str) -> DataFrame:
    """Resolve the manifest ONCE and read that snapshot; later commits do
    not affect this DataFrame's underlying files until GC passes the
    snapshot's version."""
    cur = current_version(root)
    if cur is None:
        raise FileNotFoundError(f"empty versioned store: {root}")
    return spark.read.parquet(os.path.join(root, cur))


def read_version(spark: SparkSession, root: str, version: str) -> DataFrame:
    """Time travel: read a SPECIFIC committed version, bypassing the
    manifest — the ``VERSION AS OF`` of this store. Valid until
    ``gc_versions`` reclaims the directory; a GC'd or never-committed
    version fails fast with the available versions listed."""
    vdir = os.path.join(root, version)
    if not os.path.isdir(vdir):
        raise FileNotFoundError(
            f"version {version!r} not in store {root} (have: {_versions(root)})"
        )
    return spark.read.parquet(vdir)


def gc_versions(root: str, keep: int = 2) -> list[str]:
    """Delete all version dirs except the newest ``keep`` (the current
    version is always within the newest ``keep``; unreferenced
    crash-orphans older than that are removed too), plus any ``.stage_*``
    dir whose writer died mid-stage. Returns the deleted directory names.
    Size ``keep`` to cover the longest-running reader.

    Stage reclamation is race-free against live writers: a writer flocks
    its stage's ``.STAGE_LOCK`` for the stage's whole life (commit renames
    the dir away under the commit lock), so gc removes a stage only when
    a NON-BLOCKING flock succeeds — i.e. the writer is dead and the
    kernel released its lock. A stage dir with no lock file yet (the
    microsecond mkdtemp→flock window, or a pre-flock crash) is skipped
    and leaks until manual cleanup — it is empty and tiny. Lock files
    younger than ``_STAGE_GC_GRACE_S`` are likewise skipped: between the
    writer's ``os.open(O_CREAT)`` of the lock and its flock, gc could
    otherwise acquire the unheld lock and rmtree a LIVE stage (the write
    would self-heal by recreating the dir, but the stage would lose its
    lock file for the rest of its life and gc would report a deletion
    that reappears); the grace window dwarfs the create→flock gap."""
    if keep < 1:
        raise ValueError("keep must be >= 1")
    vs = _versions(root)
    cur = current_version(root)
    doomed = [v for v in vs[:-keep] if v != cur]
    for v in doomed:
        shutil.rmtree(os.path.join(root, v))
    for d in os.listdir(root) if os.path.isdir(root) else []:
        if not d.startswith(".stage_"):
            continue
        lock = os.path.join(root, d, _STAGE_LOCK)
        try:
            if time.time() - os.path.getmtime(lock) < _STAGE_GC_GRACE_S:
                continue  # young lock: writer may be inside create->flock
            fd = os.open(lock, os.O_RDWR)
        except OSError:
            continue  # no lock file (pre-flock window) or dir just renamed
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            os.close(fd)
            continue  # live writer still staging
        try:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
            doomed.append(d)
        finally:
            os.close(fd)
    return doomed
