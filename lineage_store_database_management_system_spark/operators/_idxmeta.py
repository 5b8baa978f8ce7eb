"""Optimistic concurrency for the durable retrieval indexes'
sidecars (BM25 / trigram ``_meta.json``, ANN ``_ann_meta.json``) —
the lineage tables' ``_ManifestLock`` / ``ConcurrentWriteError``
compare-and-swap (lineage.py:138,425) ported to the index
maintenance surface (VERDICT r13 What's-missing #2: two concurrent
maintainers — e.g. a stream upsert racing ``tools/maintain.py``
compaction — last-meta-wins'd silently, and the repair machinery
would heal counters but not a lost tombstone batch).

Discipline (mirrors the lineage commit protocol):

- every meta carries a monotonically increasing ``commit_seq``;
- a mutation RESERVES before its first data write
  (:func:`reserve_meta`): under the lock-file mutex, the disk
  ``commit_seq`` must equal the snapshot the mutator read — a loser
  aborts with :class:`IndexConcurrentWriteError` BEFORE publishing
  anything, the winner's files untouched; the reservation publishes
  a ``_pending`` lease (writer token + wall-clock) so a second
  writer conflicts for the whole data-write window, not just the
  meta rewrite (index mutations, unlike lineage appends, do not
  commute: generation ids and additive counters both collide);
- the final counter rewrite PUBLISHES (:func:`publish_meta`): the
  disk lease must still be ours, and the pending marker is cleared
  in the same atomic rename;
- marker-only rewrites that must not clobber or be clobbered (the
  stream-batch reservation markers) go through
  :func:`update_meta_atomic` — a read-modify-write under the same
  mutex that also conflicts with a foreign active lease;
- the repair functions bypass the lease (``heal=True``): they are
  the designated owners of a torn state, including one left by a
  writer that died holding its lease.

A crashed writer's lease expires after :data:`PENDING_STALE_S`;
the next reservation clears it but still aborts with a retry
error, because the dead writer may have landed parquet without its
counters — the caller (or the maintenance cadence) runs the family
repair and retries on fresh state. Locks are ``O_CREAT|O_EXCL``
files — atomic on POSIX local filesystems; on HDFS/ABFS the same
role is played by atomic rename-without-overwrite."""

from __future__ import annotations

import json
import os
import time
import uuid

__all__ = [
    "IndexConcurrentWriteError",
    "read_raw_meta",
    "reserve_meta",
    "publish_meta",
    "abandon_meta",
    "update_meta_atomic",
    "retry_on_conflict",
]

# A crashed writer's lease is clearable after this long. Generous on
# purpose: the lease spans the mutation's DATA writes, which are real
# Spark jobs at scale — breaking a healthy slow writer is worse than
# waiting (the lineage lock can stay at 60 s because it only guards
# the tiny manifest CAS, never a data write).
PENDING_STALE_S = 1800.0


class IndexConcurrentWriteError(RuntimeError):
    """Another writer reserved or committed this index since our
    sidecar snapshot was read. The losing mutation is aborted BEFORE
    any of its files are published (every index mutation reserves —
    and therefore CASes the sidecar — before writing data), so no
    committed data is ever lost or mixed. Re-read the index state
    and retry."""


class _MetaLock:
    """Filesystem mutex guarding a sidecar's read-compare-write —
    the lineage ``_ManifestLock`` shape (lineage.py:138). Held only
    for the tiny JSON read/write, never across a data job."""

    STALE_AFTER_S = 60.0
    TIMEOUT_S = 30.0

    def __init__(self, index_dir: str, meta_name: str):
        self.path = os.path.join(index_dir, meta_name + ".lock")

    def __enter__(self):
        deadline = time.monotonic() + self.TIMEOUT_S
        while True:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return self
            except FileExistsError:
                try:
                    age = time.time() - os.path.getmtime(self.path)
                    if age > self.STALE_AFTER_S:
                        os.unlink(self.path)  # crashed writer; reclaim
                        continue
                except OSError:
                    continue  # lock vanished between checks; retry
                if time.monotonic() > deadline:
                    raise TimeoutError(f"could not acquire {self.path}")
                time.sleep(0.02)

    def __exit__(self, *exc):
        try:
            os.unlink(self.path)
        except OSError:
            pass


def read_raw_meta(index_dir: str, meta_name: str) -> dict:
    try:
        with open(os.path.join(index_dir, meta_name)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def _atomic_dump(index_dir: str, meta_name: str, meta: dict) -> None:
    path = os.path.join(index_dir, meta_name)
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, path)


def _check_foreign_lease(disk: dict, token: str | None, where: str) -> None:
    p = disk.get("_pending")
    if not p or (token is not None and p.get("token") == token):
        return
    age = time.time() - float(p.get("ts", 0))
    if age <= PENDING_STALE_S:
        raise IndexConcurrentWriteError(
            f"{where}: another writer holds this index's write lease "
            f"(age {age:.0f}s); abort and retry"
        )


def reserve_meta(
    index_dir: str, meta: dict, meta_name: str = "_meta.json"
) -> None:
    """CAS-claim the index for one mutation, BEFORE any data write.

    ``meta`` is the mutator's sidecar snapshot (it will carry the
    granted lease token through to :func:`publish_meta`). Raises
    :class:`IndexConcurrentWriteError` — with nothing published —
    when the disk sidecar advanced past the snapshot, or when
    another writer's unexpired lease is active. An EXPIRED lease
    (crashed writer) is cleared, but the reservation still aborts
    with a retry error: the dead writer may have landed parquet
    without its counters, so the caller must re-read (the family
    repair heals any torn state on the maintenance cadence)."""
    os.makedirs(index_dir, exist_ok=True)
    with _MetaLock(index_dir, meta_name):
        disk = read_raw_meta(index_dir, meta_name)
        if int(disk.get("commit_seq", 0)) != int(meta.get("commit_seq", 0)):
            raise IndexConcurrentWriteError(
                f"index {index_dir!r}: sidecar advanced to commit_seq="
                f"{disk.get('commit_seq', 0)} (we hold "
                f"{meta.get('commit_seq', 0)}); re-read and retry"
            )
        p = disk.get("_pending")
        if p is not None:
            age = time.time() - float(p.get("ts", 0))
            if age <= PENDING_STALE_S:
                raise IndexConcurrentWriteError(
                    f"index {index_dir!r}: another writer holds the "
                    f"write lease (age {age:.0f}s); abort and retry"
                )
            disk.pop("_pending", None)
            disk["commit_seq"] = int(disk.get("commit_seq", 0)) + 1
            _atomic_dump(index_dir, meta_name, disk)
            raise IndexConcurrentWriteError(
                f"index {index_dir!r}: cleared a stale write lease "
                f"(writer died {age:.0f}s ago, possibly mid-write) — "
                "run the index repair, re-read, and retry"
            )
        lease = {"token": uuid.uuid4().hex, "ts": time.time()}
        out = dict(disk)
        out["_pending"] = lease
        out["commit_seq"] = int(disk.get("commit_seq", 0)) + 1
        _atomic_dump(index_dir, meta_name, out)
        meta["_pending"] = lease
        meta["commit_seq"] = out["commit_seq"]


def publish_meta(
    index_dir: str,
    meta: dict,
    meta_name: str = "_meta.json",
    heal: bool = False,
) -> None:
    """Commit the mutator's final counters, clearing its lease.

    With a lease in ``meta`` (the normal reserve->publish pair), the
    disk lease must still be ours — a broken/cleared lease raises,
    because another writer may have acted on our torn state.
    ``heal=True`` is the repair functions' door: they own torn
    states by definition, so they publish unconditionally and clear
    whatever lease remains."""
    with _MetaLock(index_dir, meta_name):
        disk = read_raw_meta(index_dir, meta_name)
        mine = meta.pop("_pending", None)
        if heal:
            pass  # repairs own torn states, lease included
        elif mine is not None:
            p = disk.get("_pending")
            if not p or p.get("token") != mine.get("token"):
                raise IndexConcurrentWriteError(
                    f"index {index_dir!r}: our write lease was broken "
                    "mid-mutation (exceeded PENDING_STALE_S?); the "
                    "index may hold our unpublished rows — run the "
                    "index repair"
                )
        else:
            _check_foreign_lease(disk, None, f"index {index_dir!r} publish")
        out = dict(meta)
        out.pop("_pending", None)
        out["commit_seq"] = int(disk.get("commit_seq", 0)) + 1
        _atomic_dump(index_dir, meta_name, out)


def abandon_meta(
    index_dir: str, meta: dict, meta_name: str = "_meta.json"
) -> None:
    """Release a reservation whose mutation turned out to be a no-op
    (e.g. a delete that matched nothing): clears our lease without
    changing any counters."""
    with _MetaLock(index_dir, meta_name):
        disk = read_raw_meta(index_dir, meta_name)
        mine = meta.pop("_pending", None)
        p = disk.get("_pending")
        if mine is not None and p and p.get("token") == mine.get("token"):
            disk.pop("_pending", None)
            disk["commit_seq"] = int(disk.get("commit_seq", 0)) + 1
            _atomic_dump(index_dir, meta_name, disk)


def update_meta_atomic(
    index_dir: str, fn, meta_name: str = "_meta.json"
) -> dict:
    """Marker-only read-modify-write under the mutex (the stream-
    batch reservation markers): can neither clobber nor be clobbered
    by a concurrent counter publish, and conflicts with a foreign
    active lease like any other writer. ``fn(meta) -> None`` mutates
    in place; returns the written meta."""
    os.makedirs(index_dir, exist_ok=True)
    with _MetaLock(index_dir, meta_name):
        disk = read_raw_meta(index_dir, meta_name)
        _check_foreign_lease(disk, None, f"index {index_dir!r} marker")
        fn(disk)
        disk["commit_seq"] = int(disk.get("commit_seq", 0)) + 1
        _atomic_dump(index_dir, meta_name, disk)
        return disk


def retry_on_conflict(op, max_attempts: int = 8, backoff_s: float = 0.05):
    """Run an index mutation with bounded optimistic-concurrency
    retries — the lineage tables' ``rebase_retry`` (lineage.py:465)
    for the retrieval indexes. Safe for every public index mutation
    (write/append/delete/update/compact for BM25, trigram, and ANN):
    each re-reads its sidecar snapshot internally and reserves before
    any data write, so a conflict aborts with nothing published and
    ``op`` is re-runnable verbatim. Linear backoff bounds livelock
    under contention; the final conflict re-raises. Returns
    ``op()``'s result."""
    last: IndexConcurrentWriteError | None = None
    for attempt in range(max_attempts):
        try:
            return op()
        except IndexConcurrentWriteError as e:
            last = e
            time.sleep(backoff_s * (attempt + 1))
    raise last  # type: ignore[misc]
