"""SQLite metadata store: collections, tables, versions, transactions,
function registry, offsets.

Mirrors the reference's server-side SQLite schema role (reference:
server/libraries/td-execution/src/version_resolver.rs resolves refs against
these rows; td-services/src/execution/layers/plan.rs:31-130 pre-creates
version rows inside transactions).  Data files are invisible until their
transaction commits — the atomic multi-table publish the reference
implements in its scheduler commit step (SURVEY §3.2.7).

Scale note: metadata is tiny (one row per table version, not per data row);
SQLite is fine single-node and the SQL is ANSI enough to port to Postgres
for a multi-driver deployment.
"""

from __future__ import annotations

import datetime as dt
import sqlite3
import threading
from contextlib import contextmanager

from ..errors import VersionResolutionError
from ..tableframe._system import new_system_id

_SCHEMA = """
CREATE TABLE IF NOT EXISTS collections (
    name TEXT PRIMARY KEY,
    created_at TEXT NOT NULL
);
CREATE TABLE IF NOT EXISTS tables (
    collection TEXT NOT NULL,
    name TEXT NOT NULL,
    created_at TEXT NOT NULL,
    PRIMARY KEY (collection, name)
);
CREATE TABLE IF NOT EXISTS transactions (
    id TEXT PRIMARY KEY,
    status TEXT NOT NULL DEFAULT 'open',   -- open | committed | rolled_back
    created_at TEXT NOT NULL,
    committed_at TEXT
);
CREATE TABLE IF NOT EXISTS table_versions (
    version_id TEXT PRIMARY KEY,
    collection TEXT NOT NULL,
    table_name TEXT NOT NULL,
    path TEXT NOT NULL,
    txn_id TEXT NOT NULL,
    execution_id TEXT,
    created_at TEXT NOT NULL,
    row_count INTEGER,
    schema_hash TEXT
);
CREATE INDEX IF NOT EXISTS idx_versions_table
    ON table_versions (collection, table_name, created_at);
CREATE TABLE IF NOT EXISTS functions (
    collection TEXT NOT NULL,
    name TEXT NOT NULL,
    kind TEXT NOT NULL,                    -- publisher | transformer | subscriber
    input_tables TEXT,                     -- json list of table uris
    output_tables TEXT,                    -- json list of table names
    trigger_by TEXT,                       -- json list of table uris (or null)
    PRIMARY KEY (collection, name)
);
CREATE TABLE IF NOT EXISTS function_runs (
    id TEXT PRIMARY KEY,
    collection TEXT NOT NULL,
    function_name TEXT NOT NULL,
    txn_id TEXT NOT NULL,
    status TEXT NOT NULL DEFAULT 'scheduled',
    triggered_on TEXT NOT NULL,
    finished_at TEXT
);
CREATE TABLE IF NOT EXISTS inter_collection_permissions (
    collection TEXT NOT NULL,              -- granting (source) collection
    to_collection TEXT NOT NULL,           -- collection allowed to read it
    created_at TEXT NOT NULL,
    PRIMARY KEY (collection, to_collection)
);
CREATE TABLE IF NOT EXISTS run_logs (
    run_id TEXT NOT NULL,
    seq INTEGER NOT NULL,
    ts TEXT NOT NULL,
    line TEXT NOT NULL,
    PRIMARY KEY (run_id, seq)
);
CREATE TABLE IF NOT EXISTS offsets (
    collection TEXT NOT NULL,
    function_name TEXT NOT NULL,
    key TEXT NOT NULL,
    value TEXT,
    PRIMARY KEY (collection, function_name, key)
);
"""


def _now() -> str:
    return dt.datetime.now(dt.timezone.utc).isoformat()


class MetadataStore:
    def __init__(self, db_path: str):
        self._db_path = db_path
        self._lock = threading.Lock()
        with self._conn() as c:
            c.executescript(_SCHEMA)

    @contextmanager
    def _conn(self):
        conn = sqlite3.connect(self._db_path)
        try:
            yield conn
            conn.commit()
        finally:
            conn.close()

    # -- collections / tables ------------------------------------------
    def ensure_collection(self, name: str) -> None:
        with self._conn() as c:
            c.execute("INSERT OR IGNORE INTO collections VALUES (?, ?)",
                      (name, _now()))

    def ensure_table(self, collection: str, name: str) -> None:
        self.ensure_collection(collection)
        with self._conn() as c:
            c.execute("INSERT OR IGNORE INTO tables VALUES (?, ?, ?)",
                      (collection, name, _now()))

    def rename_collection(self, old: str, new: str) -> None:
        """Rename across every metadata table.  Version PATHS are stored
        absolute, so existing data keeps reading without a file move —
        only the logical name changes (reference UPDATE_COLLECTION)."""
        with self._conn() as c:
            if c.execute("SELECT 1 FROM collections WHERE name=?",
                         (new,)).fetchone():
                raise VersionResolutionError(f"collection {new} exists")
            for table, col in [("collections", "name"),
                               ("tables", "collection"),
                               ("table_versions", "collection"),
                               ("functions", "collection"),
                               ("function_runs", "collection"),
                               ("offsets", "collection"),
                               ("inter_collection_permissions", "collection"),
                               ("inter_collection_permissions",
                                "to_collection")]:
                c.execute(f"UPDATE {table} SET {col}=? WHERE {col}=?",
                          (new, old))

    def drop_collection(self, name: str) -> None:
        with self._conn() as c:
            n_tables = c.execute(
                "SELECT COUNT(*) FROM tables WHERE collection=?",
                (name,)).fetchone()[0]
            if n_tables:
                raise VersionResolutionError(
                    f"collection {name} has {n_tables} tables; "
                    f"delete them first")
            c.execute("DELETE FROM collections WHERE name=?", (name,))
            c.execute("DELETE FROM functions WHERE collection=?", (name,))
            c.execute("DELETE FROM inter_collection_permissions "
                      "WHERE collection=? OR to_collection=?", (name, name))

    def drop_table(self, collection: str, table: str) -> list[str]:
        """Remove a table and its version rows; returns the version paths
        so the caller can reclaim the files."""
        with self._conn() as c:
            paths = [r[0] for r in c.execute(
                "SELECT path FROM table_versions WHERE collection=? AND "
                "table_name=?", (collection, table))]
            c.execute("DELETE FROM table_versions WHERE collection=? AND "
                      "table_name=?", (collection, table))
            c.execute("DELETE FROM tables WHERE collection=? AND name=?",
                      (collection, table))
        return paths

    def drop_function(self, collection: str, name: str) -> None:
        with self._conn() as c:
            c.execute("DELETE FROM functions WHERE collection=? AND name=?",
                      (collection, name))

    def list_all_tables(self) -> list[dict]:
        with self._conn() as c:
            rows = c.execute(
                "SELECT collection, name FROM tables "
                "ORDER BY collection, name").fetchall()
        return [{"collection": cl, "name": n} for cl, n in rows]

    def list_collections(self) -> list[dict]:
        with self._conn() as c:
            rows = c.execute(
                "SELECT name, created_at FROM collections ORDER BY name"
            ).fetchall()
        return [{"name": n, "created_at": t} for n, t in rows]

    def list_tables(self, collection: str) -> list[str]:
        with self._conn() as c:
            rows = c.execute(
                "SELECT name FROM tables WHERE collection=? ORDER BY name",
                (collection,)).fetchall()
        return [r[0] for r in rows]

    # -- transactions --------------------------------------------------
    def begin_transaction(self) -> str:
        txn = new_system_id()
        with self._conn() as c:
            c.execute("INSERT INTO transactions (id, status, created_at) "
                      "VALUES (?, 'open', ?)", (txn, _now()))
        return txn

    def commit_transaction(self, txn_id: str) -> None:
        # The lock makes stamping committed_at and making the row visible
        # atomic w.r.t. snapshot_ts(): a snapshot taken at s sees exactly
        # the transactions whose commit FINISHED before s — without it, a
        # commit stamped t < s but landing after a reader's first query
        # would be visible to that reader's later queries only (torn
        # snapshot).  Process-local, like this control plane (server.py).
        with self._lock:
            with self._conn() as c:
                c.execute("UPDATE transactions SET status='committed', "
                          "committed_at=? WHERE id=?", (_now(), txn_id))

    def snapshot_ts(self) -> str:
        """A timestamp usable as a consistent `as_of` snapshot: taken
        under the commit lock, so every commit stamped <= it is already
        visible and every commit stamped > it is not yet stamped."""
        with self._lock:
            return _now()

    def rollback_transaction(self, txn_id: str) -> None:
        with self._conn() as c:
            c.execute("UPDATE transactions SET status='rolled_back' "
                      "WHERE id=?", (txn_id,))

    def cancel_transaction(self, txn_id: str) -> None:
        """Cancel a non-committed transaction and its unfinished runs
        (reference: TRANSACTION_CANCEL, rest_urls/mod.rs:269 — committed
        work is immutable, so cancel only moves open/failed states)."""
        if self.transaction_status(txn_id) == "committed":
            raise VersionResolutionError(
                f"transaction {txn_id} is committed; cannot cancel")
        with self._conn() as c:
            c.execute("UPDATE transactions SET status='canceled' WHERE id=?",
                      (txn_id,))
            c.execute(
                "UPDATE function_runs SET status='canceled', finished_at=? "
                "WHERE txn_id=? AND status IN ('scheduled','failed')",
                (_now(), txn_id))

    def recover_transaction(self, txn_id: str) -> None:
        """Re-open a canceled/rolled-back transaction so its runs can be
        retried (reference: TRANSACTION_RECOVER, rest_urls/mod.rs:270)."""
        status = self.transaction_status(txn_id)
        if status == "committed":
            raise VersionResolutionError(
                f"transaction {txn_id} is committed; nothing to recover")
        with self._conn() as c:
            c.execute("UPDATE transactions SET status='open', "
                      "committed_at=NULL WHERE id=?", (txn_id,))
            c.execute(
                "UPDATE function_runs SET status='scheduled', "
                "finished_at=NULL WHERE txn_id=? "
                "AND status IN ('canceled','failed')", (txn_id,))

    def transaction_status(self, txn_id: str) -> str:
        with self._conn() as c:
            row = c.execute("SELECT status FROM transactions WHERE id=?",
                            (txn_id,)).fetchone()
        if row is None:
            raise VersionResolutionError(f"unknown transaction {txn_id}")
        return row[0]

    # -- versions ------------------------------------------------------
    def add_version(self, collection: str, table: str, version_id: str,
                    path: str, txn_id: str, execution_id: str | None = None,
                    row_count: int | None = None,
                    schema_hash: str | None = None) -> None:
        self.ensure_table(collection, table)
        with self._conn() as c:
            c.execute(
                "INSERT INTO table_versions VALUES (?,?,?,?,?,?,?,?,?)",
                (version_id, collection, table, path, txn_id, execution_id,
                 _now(), row_count, schema_hash),
            )

    def committed_history(self, collection: str, table: str,
                          as_of: str | None = None) -> list[tuple[str, str]]:
        """Ordered (oldest->newest) [(version_id, path)] of committed
        versions, optionally 'as of' a timestamp (reference
        version_resolver.rs resolves against triggered_on).  The as_of
        filter compares COMMIT time, not version-creation time: a
        transaction's tables become visible atomically at commit, so a
        snapshot taken mid-transaction either sees all of its tables or
        none — never a torn subset."""
        sql = (
            "SELECT v.version_id, v.path FROM table_versions v "
            "JOIN transactions t ON v.txn_id = t.id "
            "WHERE v.collection=? AND v.table_name=? AND t.status='committed'"
        )
        args: list = [collection, table]
        if as_of is not None:
            sql += " AND t.committed_at <= ?"
            args.append(as_of)
        # Order by COMMIT time, not version-creation time: concurrent
        # transactions interleave their writes, so created_at ordering can
        # rank txn2's version of table A above txn1's while ranking them
        # the other way on table B — "HEAD" would then be a torn snapshot.
        # Commit time is per-transaction, so every table sees the same
        # serial order (txn_id tiebreak keeps equal-microsecond commits
        # consistent across tables).
        sql += " ORDER BY t.committed_at, v.txn_id, v.created_at, v.version_id"
        with self._conn() as c:
            return c.execute(sql, args).fetchall()

    # -- functions / runs ----------------------------------------------
    def register_function(self, collection: str, name: str, kind: str,
                          input_tables: str, output_tables: str,
                          trigger_by: str | None) -> None:
        self.ensure_collection(collection)
        with self._conn() as c:
            c.execute(
                "INSERT OR REPLACE INTO functions VALUES (?,?,?,?,?,?)",
                (collection, name, kind, input_tables, output_tables, trigger_by),
            )

    def list_functions(self) -> list[tuple]:
        with self._conn() as c:
            return c.execute(
                "SELECT collection, name, kind, input_tables, output_tables, "
                "trigger_by FROM functions").fetchall()

    def add_run(self, collection: str, fn: str, txn_id: str) -> str:
        run_id = new_system_id()
        with self._conn() as c:
            c.execute(
                "INSERT INTO function_runs (id, collection, function_name, "
                "txn_id, status, triggered_on) VALUES (?,?,?,?, 'scheduled', ?)",
                (run_id, collection, fn, txn_id, _now()),
            )
        return run_id

    def set_run_status(self, run_id: str, status: str) -> None:
        with self._conn() as c:
            c.execute("UPDATE function_runs SET status=?, finished_at=? "
                      "WHERE id=?", (status, _now(), run_id))

    def list_runs(self, collection: str | None = None,
                  fn: str | None = None) -> list[dict]:
        """Run history, newest first (reference: GET function history,
        rest_urls/mod.rs FUNCTION_HISTORY)."""
        sql = ("SELECT id, collection, function_name, txn_id, status, "
               "triggered_on, finished_at FROM function_runs")
        where, args = [], []
        if collection is not None:
            where.append("collection=?")
            args.append(collection)
        if fn is not None:
            where.append("function_name=?")
            args.append(fn)
        if where:
            sql += " WHERE " + " AND ".join(where)
        sql += " ORDER BY triggered_on DESC"
        cols = ["id", "collection", "function", "txn_id", "status",
                "triggered_on", "finished_at"]
        with self._conn() as c:
            return [dict(zip(cols, r)) for r in c.execute(sql, args)]

    def version_rows(self, collection: str, table: str) -> list[dict]:
        """Committed data-versions with stats (reference:
        LIST_TABLE_DATA_VERSIONS, rest_urls/mod.rs)."""
        sql = (
            "SELECT v.version_id, v.created_at, v.row_count, v.schema_hash, "
            "v.execution_id FROM table_versions v "
            "JOIN transactions t ON v.txn_id = t.id "
            "WHERE v.collection=? AND v.table_name=? AND t.status='committed' "
            "ORDER BY t.committed_at, v.txn_id, v.created_at, v.version_id"
        )
        cols = ["id", "created_at", "row_count", "schema_hash", "execution_id"]
        with self._conn() as c:
            return [dict(zip(cols, r))
                    for r in c.execute(sql, (collection, table))]

    def versions_with_status(self, collection: str | None = None,
                             table: str | None = None) -> list[dict]:
        """Every version row joined to its transaction status (vacuum's
        view: committed history order plus dead rolled-back/canceled
        rows)."""
        sql = ("SELECT v.version_id, v.collection, v.table_name, v.path, "
               "v.txn_id, t.status, t.committed_at, v.created_at "
               "FROM table_versions v JOIN transactions t ON v.txn_id=t.id")
        where, args = [], []
        if collection is not None:
            where.append("v.collection=?")
            args.append(collection)
        if table is not None:
            where.append("v.table_name=?")
            args.append(table)
        if where:
            sql += " WHERE " + " AND ".join(where)
        sql += (" ORDER BY t.committed_at, v.txn_id, v.created_at, "
                "v.version_id")
        cols = ["version_id", "collection", "table", "path", "txn_id",
                "status", "committed_at", "created_at"]
        with self._conn() as c:
            return [dict(zip(cols, r)) for r in c.execute(sql, args)]

    def delete_versions(self, version_ids: list[str]) -> None:
        with self._conn() as c:
            c.executemany("DELETE FROM table_versions WHERE version_id=?",
                          [(v,) for v in version_ids])

    # -- inter-collection permissions (reference rest_urls/mod.rs:147-152:
    # a collection grants another collection read access to its tables) --
    def grant_inter(self, collection: str, to_collection: str) -> None:
        self.ensure_collection(collection)
        with self._conn() as c:
            c.execute(
                "INSERT OR IGNORE INTO inter_collection_permissions "
                "VALUES (?,?,?)", (collection, to_collection, _now()))

    def revoke_inter(self, collection: str, to_collection: str) -> None:
        with self._conn() as c:
            c.execute(
                "DELETE FROM inter_collection_permissions "
                "WHERE collection=? AND to_collection=?",
                (collection, to_collection))

    def list_inter(self, collection: str) -> list[dict]:
        with self._conn() as c:
            rows = c.execute(
                "SELECT to_collection, created_at FROM "
                "inter_collection_permissions WHERE collection=? "
                "ORDER BY to_collection", (collection,)).fetchall()
        return [{"to_collection": t, "created_at": ts} for t, ts in rows]

    def inter_allowed(self, src_collection: str, consumer: str) -> bool:
        """May functions in `consumer` read tables of `src_collection`?
        Same-collection reads are always allowed; cross-collection reads
        need an explicit grant (reference authz: InterCollectionRead)."""
        if src_collection == consumer:
            return True
        with self._conn() as c:
            row = c.execute(
                "SELECT 1 FROM inter_collection_permissions "
                "WHERE collection=? AND to_collection=?",
                (src_collection, consumer)).fetchone()
        return row is not None

    # -- worker logs (reference rest_urls/mod.rs:277-287: WORKERS list +
    # per-worker logs; here one in-process worker == one function run) --
    def add_log(self, run_id: str, line: str) -> None:
        with self._conn() as c:
            seq = c.execute(
                "SELECT COALESCE(MAX(seq), -1) + 1 FROM run_logs "
                "WHERE run_id=?", (run_id,)).fetchone()[0]
            c.execute("INSERT INTO run_logs VALUES (?,?,?,?)",
                      (run_id, seq, _now(), line))

    def logs(self, run_id: str) -> list[dict]:
        with self._conn() as c:
            rows = c.execute(
                "SELECT seq, ts, line FROM run_logs WHERE run_id=? "
                "ORDER BY seq", (run_id,)).fetchall()
        return [{"seq": s, "ts": t, "line": ln} for s, t, ln in rows]

    # -- offsets (incremental ingest state, reference offset_utils.py) --
    def get_offset(self, collection: str, fn: str, key: str):
        with self._conn() as c:
            row = c.execute(
                "SELECT value FROM offsets WHERE collection=? AND "
                "function_name=? AND key=?", (collection, fn, key)).fetchone()
        return row[0] if row else None

    def get_offsets(self, collection: str, fn: str) -> dict[str, str]:
        """All persisted offsets for one function — the engine restores
        these into a source's initial_values before each run (reference
        plugin.py _run: `self.initial_values = current_initial_values`)."""
        with self._conn() as c:
            rows = c.execute(
                "SELECT key, value FROM offsets WHERE collection=? AND "
                "function_name=?", (collection, fn)).fetchall()
        return {k: v for k, v in rows}

    def set_offset(self, collection: str, fn: str, key: str, value) -> None:
        with self._conn() as c:
            c.execute(
                "INSERT OR REPLACE INTO offsets VALUES (?,?,?,?)",
                (collection, fn, key, str(value) if value is not None else None),
            )
