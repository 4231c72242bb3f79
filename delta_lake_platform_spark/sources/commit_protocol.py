"""Commit-publication protocols for ManagedTable.

The table's atomicity story has two primitives:

1. **Data publication** — making a snapshot/batch directory visible at
   a path the log entry will reference.
2. **Log-entry creation** — the single atomic commit point (Delta's
   model: whoever creates ``_log/<N>.json`` first wins version N).

How those primitives are implemented is a property of the STORAGE
SYSTEM, not of the table logic, so they live behind this seam
(VERDICT r3 #6):

- ``RenameCommitProtocol`` (default): POSIX/HDFS semantics. Data is
  written to a ``.staged-<uuid>`` sibling and atomically RENAMED to
  its final path — a losing concurrent writer fails the rename and can
  never clobber a winner's published snapshot. The log entry is an
  ``O_CREAT|O_EXCL`` create. Invariants required of the filesystem:
  atomic directory rename, exclusive create.

- ``PutIfAbsentCommitProtocol``: the object-store model (S3 has no
  atomic rename). Data is written DIRECTLY under a writer-unique
  directory (``<final>.w-<uuid>``) — no rename, no contention, and the
  files stay invisible to readers because nothing references them
  until the log entry lands. The log entry is a conditional
  put-if-absent (S3 ``If-None-Match: *`` / GCS generation-0 — emulated
  here with an exclusive create, which is the same contract).
  Invariants required of the store: conditional create of one object.
  Orphaned ``.w-`` dirs from losers/crashes are reclaimed by VACUUM's
  unreferenced-and-old rule.

Both variants are driven through the same concurrent-writer tests
(tests/test_commit_protocol.py); the choice is per-table via
``ManagedTable(..., protocol=...)``.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable


class CommitError(Exception):
    """Raised by a protocol when a concurrent writer claimed the data
    path or the log entry first. ManagedTable re-raises it as
    ConcurrentWriteError."""


def _create_exclusive(entry_path: str, payload: str) -> None:
    """Shared exclusive-create primitive with the same win-or-fail
    contract as an object store's conditional put (If-None-Match: * /
    generation-0).

    The claim and the CONTENT must be one atomic event: a real
    conditional put publishes the whole object or nothing, and log
    readers poll the latest entry (schema resolution, watermark scans)
    the moment it exists. An O_EXCL create followed by write() exposes
    an empty/partial entry between the two syscalls — observed as a
    flaky JSONDecodeError under 20-thread concurrent appends — so the
    payload is written to a writer-unique sibling first and link(2)'d
    to the final name: link fails with EEXIST if the path exists
    (atomic claim) and the target appears with its full content."""
    os.makedirs(os.path.dirname(entry_path), exist_ok=True)
    tmp = f"{entry_path}.tmp-{uuid.uuid4().hex[:12]}"
    with open(tmp, "w") as f:
        f.write(payload)
    try:
        os.link(tmp, entry_path)
    except FileExistsError as e:
        raise CommitError(
            f"log entry {entry_path} was committed concurrently"
        ) from e
    finally:
        os.unlink(tmp)


class RenameCommitProtocol:
    """Stage + atomic rename (POSIX/HDFS). The published path IS the
    requested path."""

    name = "rename"

    def publish_data(
        self, write: Callable[[str], None], final_dir: str
    ) -> str:
        staged = f"{final_dir}.staged-{uuid.uuid4().hex[:12]}"
        write(staged)
        os.makedirs(os.path.dirname(final_dir), exist_ok=True)
        try:
            os.rename(staged, final_dir)
        except OSError as e:
            shutil.rmtree(staged, ignore_errors=True)
            raise CommitError(
                f"data path {final_dir} was claimed by a concurrent writer"
            ) from e
        return final_dir

    def create_entry(self, entry_path: str, payload: str) -> None:
        _create_exclusive(entry_path, payload)


class PutIfAbsentCommitProtocol:
    """Writer-unique data prefix + conditional log-entry put (object
    stores without atomic rename). ``publish_data`` returns a DIFFERENT
    path than requested — the caller must reference the returned path
    in its log entry (ManagedTable does)."""

    name = "put-if-absent"

    def publish_data(
        self, write: Callable[[str], None], final_dir: str
    ) -> str:
        actual = f"{final_dir}.w-{uuid.uuid4().hex[:12]}"
        # No rename: the dir is never contended (unique suffix) and
        # stays invisible until a log entry references it.
        write(actual)
        return actual

    def create_entry(self, entry_path: str, payload: str) -> None:
        # Local emulation of a conditional put (If-None-Match: *).
        _create_exclusive(entry_path, payload)
