"""LogStore — the put-if-absent commit seam (Delta's LogStore contract).

The managed-table format's whole concurrency story reduces to ONE
primitive: *atomically create the commit record ``_commits/{n}.json``
iff no record for slot n exists*. Everything else in the commit path
(staging writes, digest jobs, the ``v{n}`` rename, sidecar manifests)
is private until that record lands, and the ``_latest`` pointer is
derivable state republished after it. On a local filesystem the
primitive is ``open(..., O_CREAT|O_EXCL)``; on S3 it is a conditional
PUT (``If-None-Match: *`` — supported since Nov 2024); before that,
Delta deployments used a DynamoDB coordination table (the
S3DynamoDBLogStore pattern: the conditional WRITE happens in DynamoDB,
the object body follows, and readers repair claimed-but-missing
objects from the table). This module extracts that seam so the same
commit protocol runs against any backend that can do a conditional
put — layout.py's snapshot_commit / snapshot_commit_ref /
snapshot_rollback call the active store and never touch the race
primitive directly.

Contract (PORTABILITY.md "Commit protocol" section):

* ``put_record_if_absent(cdir, name, payload)`` — atomically create
  ``cdir/name`` with ``payload`` iff absent; return True on the win,
  False if ANY writer (this process or another, this machine or
  another) already owns the slot. This is the ONLY race decider; it
  must be correct under arbitrary cross-process/cross-host
  interleaving. Payload is small JSON (a commit record, < ~100 KB
  with a capped write-set).
* ``list_records(cdir)`` — names of all commit records, with
  read-after-write consistency w.r.t. this store's own successful
  puts (S3 lists are strongly consistent since 2020; a DynamoDB-
  style adapter must REPAIR claimed-but-unmaterialized records here
  so allocation never reuses a claimed slot).
* ``publish_pointer(table_path, version)`` — full-object atomic
  replace of the small ``_latest`` pointer. Last-writer-wins is
  CORRECT here (the pointer is derivable from the record set + the
  lineage; see snapshot_rollback), so no conditional semantics are
  needed — POSIX rename locally, a plain PUT on an object store.

Records remain PLAIN FILES in every adapter: the store mediates only
the race, so every read path (readers, time travel, CDC, audits)
stays backend-agnostic — Delta's LogStore makes the same cut.

Adapter selection: ``set_log_store()`` programmatically, or the
``SPARK_GRAFT_LOGSTORE`` env var (``local`` | ``sqlite``) read at
import — the env path is what lets a spawned OS process join the same
coordination domain in the cross-process race tests.
"""

from __future__ import annotations

import json
import os


class LogStore:
    """Base adapter: local POSIX filesystem, O_EXCL + rename.

    Correct wherever ``open(O_CREAT|O_EXCL)`` is atomic against
    concurrent creators — any local FS and NFSv3+ with proper
    O_EXCL support. This is the default and the fast path: one
    syscall decides the race."""

    name = "local"

    def put_record_if_absent(self, cdir: str, name: str, payload: str) -> bool:
        try:
            with open(os.path.join(cdir, name), "x") as f:
                f.write(payload)
            return True
        except FileExistsError:
            return False

    def list_records(self, cdir: str) -> list[str]:
        if not os.path.isdir(cdir):
            return []
        return [f for f in os.listdir(cdir) if f.endswith(".json")]

    def has_record(self, cdir: str, name: str) -> bool:
        """Existence probe for ONE record — the O(1) primitive behind
        the allocation high-water hint (r12, verdict #4: a directory
        LIST per commit/resolve is O(records) and becomes the ceiling
        at 10^6 versions; probing ``hint+1, hint+2, …`` is O(1)
        amortized because slots are allocated contiguously and never
        deleted). Adapters with claim repair must treat a
        claimed-but-unmaterialized record as EXISTING (and may repair
        it here), exactly like list_records."""
        return os.path.isfile(os.path.join(cdir, name))

    def publish_pointer(self, table_path: str, version: int) -> None:
        tmp = os.path.join(table_path, "_latest.tmp")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(table_path, "_latest"))

    def publish_pointer_monotone(self, table_path: str, version: int) -> None:
        """COMMIT-path pointer flip: never moves ``_latest`` backwards
        (advice r13, low: ``resolve_entry`` may roll a crashed/slow
        publish forward past an in-flight writer; when that writer's
        own flip finally runs, an unconditional replace would regress
        the pointer below a newer published version and serve stale
        'latest' reads until the next entry heals it).

        The read-compare-replace is serialized with ``flock`` on a
        sidecar lock file — atomic across processes sharing one
        filesystem, released by the kernel on crash, ~2 syscalls. An
        object-store adapter overrides with a conditional PUT
        (If-Match on the pointer's ETag) retry loop; if neither
        primitive exists, the plain compare-then-replace below is
        still safe — the residual window is exactly the one
        ``resolve_entry`` already repairs on the next op entry.

        Unconditional :meth:`publish_pointer` remains the primitive
        for explicit ``snapshot_rollback`` (the one legitimate
        pointer regression)."""
        lock = os.path.join(table_path, "_latest.lock")
        try:
            import fcntl

            lk = open(lock, "a")
        except (ImportError, OSError):
            lk = None
        try:
            if lk is not None:
                fcntl.flock(lk, fcntl.LOCK_EX)
            cur = 0
            try:
                with open(os.path.join(table_path, "_latest")) as f:
                    cur = int(f.read().strip())
            except (OSError, ValueError):
                cur = 0
            if version > cur:
                self.publish_pointer(table_path, version)
        finally:
            if lk is not None:
                try:
                    fcntl.flock(lk, fcntl.LOCK_UN)
                finally:
                    lk.close()


class SqliteCoordLogStore(LogStore):
    """DynamoDB-style coordination adapter: the conditional put is an
    ``INSERT`` into a shared SQLite database (stdlib; real cross-
    process atomicity via SQLite's file locking), the record body
    rides IN the same transaction, and the file is materialized
    after the win. ``list_records`` repairs claimed-but-missing
    files from the db — a writer that crashed between its INSERT win
    and the file write can never cause a slot to be reused or a
    record to be lost (the S3DynamoDBLogStore incomplete-commit
    repair rule).

    This is the contract's proof-of-seam: a second coordination
    mechanism with none of O_EXCL's semantics, passing the same
    cross-process race tests. A real S3+DynamoDB adapter replaces
    sqlite3 calls with a conditional PutItem and S3 PUTs — the
    protocol above this class does not change.

    ``db_path``: one coordination database per deployment (like one
    DynamoDB table); keys are (commit-dir, **table-generation nonce**,
    record-name), so any number of tables share it AND a table
    dropped and recreated at the same path starts a fresh claim
    domain (advice r11, low: without the nonce, ``list_records``
    "repaired" a dead table's old commit records back into the fresh
    table — resurrected versions and slot collisions). The nonce is
    one uuid written O_EXCL to ``cdir/_domain`` the first time this
    adapter touches the table; every process reads the same value,
    and a recreate (new cdir) mints a new one. The default db path is
    per-user under the user's runtime dir, not a world-writable
    shared /tmp name."""

    name = "sqlite"

    def __init__(self, db_path: str | None = None):
        self.db_path = db_path or os.environ.get(
            "SPARK_GRAFT_LOGSTORE_DB", self._default_db_path()
        )

    @staticmethod
    def _default_db_path() -> str:
        """Per-user coordination db under the world-writable temp
        root. SQUATTING-hardened (r13, verdict #8): a predictable
        name in /tmp can be pre-created by another local user, who
        would then own the coordination database — able to read every
        commit payload and, worse, to drop claims (silent lost
        commits). After makedirs the dir must be OWNED by this uid
        and group/other-inaccessible; a chmod repairs a loose mode on
        our own dir, but a foreign owner is a hard refusal — the
        caller should set SPARK_GRAFT_LOGSTORE_DB to a private
        location instead."""
        import getpass
        import stat
        import tempfile

        d = os.path.join(
            tempfile.gettempdir(),
            f"spark_graft_{getpass.getuser()}",
        )
        os.makedirs(d, mode=0o700, exist_ok=True)
        st = os.lstat(d)
        if hasattr(os, "geteuid") and st.st_uid != os.geteuid():
            raise PermissionError(
                f"coordination dir {d} is owned by uid {st.st_uid}, "
                f"not this process (uid {os.geteuid()}) — a squatter "
                "would own the commit race. Set SPARK_GRAFT_LOGSTORE_DB "
                "to a private path."
            )
        if not stat.S_ISDIR(st.st_mode):
            raise PermissionError(
                f"coordination path {d} exists and is not a directory"
            )
        if stat.S_IMODE(st.st_mode) & 0o077:
            os.chmod(d, 0o700)  # our dir, loose mode: tighten or raise
            if stat.S_IMODE(os.lstat(d).st_mode) & 0o077:
                raise PermissionError(
                    f"cannot restrict {d} to owner-only access"
                )
        return os.path.join(d, "logstore.db")

    @staticmethod
    def _domain(cdir: str) -> str:
        """The table-generation nonce: minted once per commit-dir
        lifetime (O_EXCL — concurrent minters get one winner), read
        by everyone after. Deleting the table deletes the nonce, so
        a recreated table can never match the dead generation's
        claims."""
        import uuid

        p = os.path.join(cdir, "_domain")
        try:
            with open(p, "x") as f:
                f.write(uuid.uuid4().hex)
        except FileExistsError:
            pass
        except FileNotFoundError:
            os.makedirs(cdir, exist_ok=True)
            return SqliteCoordLogStore._domain(cdir)
        with open(p) as f:
            return f.read().strip()

    def _conn(self):
        import sqlite3

        conn = sqlite3.connect(self.db_path, timeout=30.0)
        conn.execute(
            "CREATE TABLE IF NOT EXISTS commits_v2 ("
            " cdir TEXT NOT NULL, domain TEXT NOT NULL,"
            " name TEXT NOT NULL, payload TEXT,"
            " PRIMARY KEY (cdir, domain, name))"
        )
        return conn

    def put_record_if_absent(self, cdir: str, name: str, payload: str) -> bool:
        dom = self._domain(cdir)
        conn = self._conn()
        try:
            try:
                with conn:  # one transaction: the conditional write
                    conn.execute(
                        "INSERT INTO commits_v2 "
                        "(cdir, domain, name, payload) VALUES (?, ?, ?, ?)",
                        (os.path.abspath(cdir), dom, name, payload),
                    )
            except Exception as e:  # IntegrityError → slot taken
                import sqlite3

                if isinstance(e, sqlite3.IntegrityError):
                    return False
                raise
        finally:
            conn.close()
        # the slot is WON — materialize the record file (readers are
        # file-based in every adapter). A crash before this write is
        # repaired by list_records.
        self._materialize(cdir, name, payload)
        return True

    @staticmethod
    def _materialize(cdir: str, name: str, payload: str) -> None:
        tmp = os.path.join(cdir, f".{name}.tmp")
        with open(tmp, "w") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(cdir, name))

    def list_records(self, cdir: str) -> list[str]:
        on_disk = set(super().list_records(cdir))
        if not os.path.isdir(cdir):
            # no live table generation → nothing to repair INTO; a
            # dead generation's claims must stay dead
            return sorted(on_disk)
        dom = self._domain(cdir)
        conn = self._conn()
        try:
            rows = conn.execute(
                "SELECT name, payload FROM commits_v2 "
                "WHERE cdir = ? AND domain = ?",
                (os.path.abspath(cdir), dom),
            ).fetchall()
        finally:
            conn.close()
        for name, payload in rows:
            if name not in on_disk:  # incomplete-commit repair
                self._materialize(cdir, name, payload)
                on_disk.add(name)
        return sorted(on_disk)

    def has_record(self, cdir: str, name: str) -> bool:
        if os.path.isfile(os.path.join(cdir, name)):
            return True
        if not os.path.isdir(cdir):
            return False
        conn = self._conn()
        try:
            row = conn.execute(
                "SELECT payload FROM commits_v2 "
                "WHERE cdir = ? AND domain = ? AND name = ?",
                (os.path.abspath(cdir), self._domain(cdir), name),
            ).fetchone()
        finally:
            conn.close()
        if row is None:
            return False
        self._materialize(cdir, name, row[0])  # incomplete-commit repair
        return True


_STORE: LogStore | None = None


def get_log_store() -> LogStore:
    global _STORE
    if _STORE is None:
        kind = os.environ.get("SPARK_GRAFT_LOGSTORE", "local").lower()
        _STORE = SqliteCoordLogStore() if kind == "sqlite" else LogStore()
    return _STORE


def set_log_store(store: LogStore | None) -> None:
    """Install an adapter (None resets to env/default selection)."""
    global _STORE
    _STORE = store
