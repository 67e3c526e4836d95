"""Pluggable commit primitives — the two operations the engine's
exactly-once story bottoms out in, behind a swappable backend.

Every manifest commit, CURRENT flip, and transaction record in the
lake reduces to exactly two storage operations:

- ``publish(path, text)`` — make ``text`` the content of ``path``
  ATOMICALLY: a reader concurrent with (or after a crash during) the
  call sees the complete old content or the complete new content,
  never a torn mix, and the new content is readable the moment the
  call returns.
- ``create_if_absent(path, text)`` — atomically claim ``path``:
  exactly one of N concurrent callers succeeds; the rest raise
  ``CommitConflictError``. This is the commit POINT for versioned
  manifests and txn records (optimistic concurrency arbiter).

The default :class:`PosixCommitBackend` implements them with
``fsync + rename`` and ``link(2)`` — correct on any POSIX filesystem.
A real 100-TB deployment writes to an object store where rename is
NOT atomic and exclusive-create is a conditional put; the mapping is
mechanical because single-object PUTs are already atomic there:

======================  =========================  =========================
primitive               S3                         GCS
======================  =========================  =========================
publish                 PUT (atomic per object)    upload (atomic per object)
create_if_absent        PUT If-None-Match: *       upload ifGenerationMatch=0
delete                  DELETE                     delete
======================  =========================  =========================

(Both stores are strongly consistent read-after-write since 2020-2024,
which is the only consistency the protocol needs; see README
"Object-store deployment".)

:class:`FaultInjectingBackend` is the test double: same contract,
plus scheduled crashes at op boundaries, TORN publishes (simulating a
non-atomic rename / interrupted multipart PUT), and DELAYED VISIBILITY
of created files (created-but-not-yet-listable, the state a recovery
pass can observe after another writer's crash). The crash/race suites
run against it to prove the protocol depends only on this interface's
contract, not on incidental POSIX behavior — reference parity: the
reference fences via MySQL checksums and syncs to S3 without any
atomic-commit story (etl/publish.py:99-176); this engine keeps
exactly-once but makes the storage dependency explicit and portable.
"""

from __future__ import annotations

import os
import uuid


class CommitConflictError(RuntimeError):
    """Another writer committed this version first (optimistic
    concurrency, Iceberg-style): re-read CURRENT and retry the merge."""


class BackendCrash(RuntimeError):
    """Injected by FaultInjectingBackend to simulate process death at
    a storage-operation boundary (tests catch this where production
    code would simply be dead)."""


class CommitBackend:
    """Interface; see module docstring for the exact contract."""

    def publish(self, path: str, text: str) -> None:
        raise NotImplementedError

    def create_if_absent(self, path: str, text: str) -> None:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError


class PosixCommitBackend(CommitBackend):
    """fsync + rename / link(2): atomic on any POSIX filesystem."""

    def publish(self, path: str, text: str) -> None:
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def create_if_absent(self, path: str, text: str) -> None:
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        try:
            # hard link = atomic fail-if-exists on POSIX (os.replace
            # would overwrite); the link target stays in place on loss
            os.link(tmp, path)
        except FileExistsError:
            os.unlink(tmp)
            raise CommitConflictError(f"version file already committed: {path}")
        os.unlink(tmp)

    def delete(self, path: str) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass


class FaultInjectingBackend(CommitBackend):
    """Contract-preserving wrapper with three injectable faults:

    - ``crash_next(op, when)``: the next ``op`` ("publish"/"create"/
      "delete") raises BackendCrash ``when`` = "before" (no effect
      taken) or "after" (effect durable, caller dead before its next
      step) — the two legal crash positions under the contract.
    - ``crash_next("publish", when="torn")``: the publish leaves a
      PARTIAL object at the path and dies — the one fault a
      non-atomic-rename store can produce that the contract forbids;
      used to prove the engine's torn-CURRENT self-heal.
    - ``delay_visibility=True``: ``create_if_absent`` succeeds for the
      writer (and still conflicts with later claims) but the file is
      INVISIBLE to direct filesystem readers/listers until
      ``reveal()`` — the created-but-not-yet-listable window another
      process's recovery can observe.
    """

    def __init__(self, inner: CommitBackend | None = None,
                 delay_visibility: bool = False):
        self.inner = inner or PosixCommitBackend()
        self.delay_visibility = delay_visibility
        self._pending: dict[str, str] = {}
        self._armed: dict[str, str] = {}
        self.ops: list[tuple[str, str]] = []

    def crash_next(self, op: str, when: str = "after") -> None:
        assert op in ("publish", "create", "delete") and when in ("before", "after", "torn")
        self._armed[op] = when

    def reveal(self) -> list[str]:
        """Make every pending (created-but-hidden) file visible, as the
        store eventually would; returns the revealed paths."""
        out = []
        for path, text in self._pending.items():
            self.inner.publish(path, text)
            out.append(path)
        self._pending.clear()
        return out

    def publish(self, path: str, text: str) -> None:
        self.ops.append(("publish", path))
        when = self._armed.get("publish")
        if when == "before":
            del self._armed["publish"]
            raise BackendCrash("injected crash before publish")
        if when == "torn":
            del self._armed["publish"]
            with open(path, "w") as f:  # torn: partial content, no rename
                f.write(text[: max(1, len(text) // 2)] + "\x00")
            raise BackendCrash("injected torn publish")
        self.inner.publish(path, text)
        if when == "after":
            del self._armed["publish"]
            raise BackendCrash("injected crash after publish")

    def create_if_absent(self, path: str, text: str) -> None:
        self.ops.append(("create", path))
        when = self._armed.get("create")
        if when == "before":
            del self._armed["create"]
            raise BackendCrash("injected crash before create")
        if self.delay_visibility:
            if path in self._pending or os.path.exists(path):
                raise CommitConflictError(f"version file already committed: {path}")
            self._pending[path] = text  # claimed, not yet listable
        else:
            self.inner.create_if_absent(path, text)
        if when == "after":
            del self._armed["create"]
            raise BackendCrash("injected crash after create")

    def delete(self, path: str) -> None:
        self.ops.append(("delete", path))
        when = self._armed.get("delete")
        if when == "before":
            del self._armed["delete"]
            raise BackendCrash("injected crash before delete")
        self._pending.pop(path, None)
        self.inner.delete(path)
        if when == "after":
            del self._armed["delete"]
            raise BackendCrash("injected crash after delete")


_BACKEND: CommitBackend = PosixCommitBackend()


def get_backend() -> CommitBackend:
    return _BACKEND


def set_backend(backend: CommitBackend | None) -> CommitBackend:
    """Swap the process-wide commit backend (None restores POSIX);
    returns the previous one so tests can restore it."""
    global _BACKEND
    prev = _BACKEND
    _BACKEND = backend or PosixCommitBackend()
    return prev
