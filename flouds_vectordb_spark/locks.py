"""Single-writer ingest contract per collection.

The reference serializes mutating DDL/ingest through Milvus itself plus a
process-wide lock around the database-switch window
(/root/reference/app/milvus/base_milvus.py:1190-1214 `_create_lock`);
segment transactionality then makes concurrent inserts safe server-side.
This engine's storage is plain parquet (append segments + tmp/swap
compaction, operators/upsert.py) which has NO server arbitrating writers:
two concurrent writers could interleave a compaction rmtree+rename with an
append and silently lose the appended batch.

WriterLock makes the single-writer contract EXPLICIT and ENFORCED instead
of implicit: every mutating CollectionWriter entry point (insert_data,
flush, build_index, build_sparse_index) acquires the collection's lock
file and raises ConcurrentWriteError — loudly, immediately — when another
LIVE writer holds it. Crash-safety: the lock file records pid+host+ts; a
lock whose owner process is dead (same host) or older than `stale_after`
is broken and re-acquired, so a crashed writer never wedges the
collection.

Scope/design note (100 TB): this is an O(1) driver-side file in the
collection directory — no Spark involvement, no executor traffic. On a
real cluster with a transactional table format (Delta/Iceberg MERGE, as
PLANS.md documents for the compaction path) the format's optimistic commit
protocol subsumes this lock; for the plain-parquet lowest common
denominator the lock IS the documented contract, and the two-writer test
(tests/test_upsert_catalog.py) pins the fail-loudly behavior.
"""

from __future__ import annotations

import json
import os
import socket
import time


class ConcurrentWriteError(RuntimeError):
    """Another live writer holds this collection's writer lock."""


class WriterLock:
    """File-based exclusive writer lock (O_CREAT|O_EXCL), reentrant within
    the owning object via an acquisition depth counter."""

    # a same-host lock older than HARD_STALE_FACTOR * stale_after is broken
    # even if its recorded pid is alive (pid-recycling escape hatch); any
    # single operation is expected to finish well inside this bound
    HARD_STALE_FACTOR = 24

    def __init__(self, lock_path: str, stale_after: float = 3600.0):
        self.lock_path = lock_path
        self.stale_after = float(stale_after)
        self._depth = 0

    # ---- owner liveness ----------------------------------------------------
    def _read_owner(self) -> dict | None:
        try:
            with open(self.lock_path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _owner_is_stale(self, owner: dict | None) -> bool:
        if owner is None:
            # unreadable/corrupt lock: age it off via mtime
            try:
                return time.time() - os.path.getmtime(self.lock_path) > self.stale_after
            except OSError:
                return True  # vanished: not held
        age = time.time() - float(owner.get("ts", 0))
        if owner.get("host") == socket.gethostname():
            # same host: pid liveness decides — a live owner keeps its lock
            # past stale_after (a legitimate long compaction must not lose
            # it to the age heuristic) — EXCEPT beyond the hard bound: a
            # crashed writer whose pid the OS recycled to an unrelated
            # long-lived process would otherwise wedge the collection
            # forever
            if age > self.HARD_STALE_FACTOR * self.stale_after:
                return True
            try:
                os.kill(int(owner["pid"]), 0)  # signal 0: existence probe
                return False
            except (ProcessLookupError, ValueError):
                return True
            except PermissionError:
                return False  # exists, owned by another user
        # other host: no liveness probe available — fall back to age
        return age > self.stale_after

    # ---- acquire/release ---------------------------------------------------
    def acquire(self, wait_s: float = 0.0) -> None:
        """Take the lock. wait_s=0 (ingest default) fails fast with
        ConcurrentWriteError when a live writer holds it; wait_s>0 retries
        for up to that long before raising — the right mode for tiny
        metadata read-modify-writes where blocking briefly beats failing."""
        if self._depth > 0:
            self._depth += 1
            return
        deadline = time.monotonic() + float(wait_s)
        while True:
            try:
                self._acquire_once()
                return
            except ConcurrentWriteError:
                if time.monotonic() >= deadline:
                    raise
                time.sleep(0.05)

    def _acquire_once(self) -> None:
        os.makedirs(os.path.dirname(self.lock_path) or ".", exist_ok=True)
        payload = json.dumps({
            "pid": os.getpid(), "host": socket.gethostname(),
            "ts": time.time(),
        }).encode()
        for attempt in (1, 2):
            try:
                fd = os.open(self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                try:
                    os.write(fd, payload)
                finally:
                    os.close(fd)
                self._depth = 1
                return
            except FileExistsError:
                owner = self._read_owner()
                if attempt == 1 and self._owner_is_stale(owner):
                    # break the dead writer's lock by RENAMING it aside:
                    # rename is atomic on the source, so of two racing
                    # breakers exactly ONE moves the file (the other's
                    # source is gone and it just retries the O_EXCL
                    # create) — a bare unlink here could remove the OTHER
                    # breaker's freshly created lock, letting both in
                    aside = f"{self.lock_path}.stale.{os.getpid()}"
                    try:
                        os.rename(self.lock_path, aside)
                    except FileNotFoundError:
                        continue  # the other breaker won; contend normally
                    # verify we moved the lock we JUDGED stale — a racing
                    # breaker may have broken it and re-acquired between
                    # our judgment and our rename, making the moved file a
                    # LIVE lock that must be put back (os.link restores
                    # without clobbering anything created meanwhile)
                    moved = None
                    try:
                        with open(aside) as f:
                            moved = json.load(f)
                    except (OSError, ValueError):
                        pass
                    if moved == owner:
                        os.unlink(aside)
                        continue
                    try:
                        os.link(aside, self.lock_path)
                    except FileExistsError:
                        pass  # a third writer locked meanwhile; theirs stands
                    os.unlink(aside)
                    continue
                raise ConcurrentWriteError(
                    f"collection is locked by another writer "
                    f"(lock={self.lock_path}, owner={owner}); concurrent "
                    f"ingest on plain-parquet storage is unsafe — retry "
                    f"after the other writer finishes, or remove the lock "
                    f"file if its owner crashed on another host")

    def release(self) -> None:
        if self._depth == 0:
            return
        self._depth -= 1
        if self._depth == 0:
            # unlink only OUR lock: if a cross-host breaker aged us out
            # during a very long operation, the file now belongs to the
            # new owner and removing it would admit a third writer
            owner = self._read_owner()
            ours = (owner is not None
                    and owner.get("pid") == os.getpid()
                    and owner.get("host") == socket.gethostname())
            if ours or owner is None:
                try:
                    os.unlink(self.lock_path)
                except FileNotFoundError:
                    pass

    def __enter__(self) -> "WriterLock":
        self.acquire()
        return self

    def __exit__(self, *exc) -> None:
        self.release()
