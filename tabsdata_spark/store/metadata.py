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
        with self._conn() as c:
            c.execute("UPDATE transactions SET status='committed', "
                      "committed_at=? WHERE id=?", (_now(), txn_id))

    def rollback_transaction(self, txn_id: str) -> None:
        with self._conn() as c:
            c.execute("UPDATE transactions SET status='rolled_back' "
                      "WHERE id=?", (txn_id,))

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
        version_resolver.rs resolves against triggered_on)."""
        sql = (
            "SELECT v.version_id, v.path FROM table_versions v "
            "JOIN transactions t ON v.txn_id = t.id "
            "WHERE v.collection=? AND v.table_name=? AND t.status='committed'"
        )
        args: list = [collection, table]
        if as_of is not None:
            sql += " AND v.created_at <= ?"
            args.append(as_of)
        sql += " ORDER BY v.created_at, v.version_id"
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
            "ORDER BY v.created_at, v.version_id"
        )
        cols = ["id", "created_at", "row_count", "schema_hash", "execution_id"]
        with self._conn() as c:
            return [dict(zip(cols, r))
                    for r in c.execute(sql, (collection, table))]

    # -- offsets (incremental ingest state, reference offset_utils.py) --
    def get_offset(self, collection: str, fn: str, key: str):
        with self._conn() as c:
            row = c.execute(
                "SELECT value FROM offsets WHERE collection=? AND "
                "function_name=? AND key=?", (collection, fn, key)).fetchone()
        return row[0] if row else None

    def set_offset(self, collection: str, fn: str, key: str, value) -> None:
        with self._conn() as c:
            c.execute(
                "INSERT OR REPLACE INTO offsets VALUES (?,?,?,?)",
                (collection, fn, key, str(value) if value is not None else None),
            )
