"""TableStore: versioned Parquet storage over Spark + the metadata DB.

Storage layout mirrors the reference's V2 scheme
(server/libraries/td-storage/src/location.rs:19-38):
    <root>/c/<COLLECTION>/d/<DATA_VERSION>/t/<TABLE>/<TABLE_VERSION>.t
with the difference that each version is a *directory* of part files —
Spark's natural parallel-write unit — instead of a single file.  At 100 TB
each version directory holds as many part files as there were write tasks;
readers scan them in parallel with partition pruning intact.

Writes stamp system columns (`sys` mode, §1.2) and register the version in
the metadata store inside a transaction; versions become visible only when
the transaction commits (atomic multi-table publish, SURVEY §3.2.7).
"""

from __future__ import annotations

import hashlib
import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from ..errors import VersionResolutionError
from ..tableframe import _system as S
from ..tableframe.frame import TableFrame
from .metadata import MetadataStore
from .versions import TableURI, Version, parse_versions, resolve_refs


def _schema_hash(df: DataFrame) -> str:
    """Structural schema hash over sorted (name, dtype) pairs (reference
    store_results_utils.py:66-88 hashes a sorted-field Arrow schema)."""
    fields = sorted((f.name, f.dataType.simpleString()) for f in df.schema.fields
                    if not S.is_system_column(f.name))
    return hashlib.sha256(repr(fields).encode()).hexdigest()[:16]


def _footer_row_count(path: str, spark: SparkSession) -> int | None:
    """Version row-count stat from parquet footers — metadata only, no data
    scan (stat parity with the reference's version rows, plan.rs).  Local
    paths sum footers on the driver; remote stores fall back to a Spark
    metadata-only count (parquet count() never reads column data)."""
    if "://" not in path or path.startswith("file://"):
        import glob as _glob

        import pyarrow.parquet as pq

        local = path[len("file://"):] if path.startswith("file://") else path
        files = _glob.glob(os.path.join(local, "*.parquet"))
        if files:
            return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    try:
        return spark.read.parquet(path).count()
    except Exception:  # stats are best-effort, never fail a write
        return None


class TableStore:
    def __init__(self, root: str, db_path: str | None = None):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.meta = MetadataStore(db_path or os.path.join(root, "metadata.db"))

    # -- layout --------------------------------------------------------
    def version_path(self, collection: str, data_version: str, table: str,
                     table_version: str) -> str:
        return os.path.join(
            self.root, "c", collection, "d", data_version, "t", table,
            f"{table_version}.t",
        )

    # -- transactions --------------------------------------------------
    @contextmanager
    def transaction(self):
        """All writes inside become visible atomically on exit; any
        exception rolls the whole set back (files remain but are never
        referenced by a committed version row)."""
        txn = self.meta.begin_transaction()
        try:
            yield txn
        except Exception:
            self.meta.rollback_transaction(txn)
            raise
        self.meta.commit_transaction(txn)

    # -- write ---------------------------------------------------------
    def write(self, frame: TableFrame | DataFrame, collection: str,
              table: str, txn_id: str | None = None,
              execution_id: str | None = None,
              partition_by: list[str] | None = None) -> str:
        """Write a new table version; returns its version id.

        `partition_by` stores the version hive-partitioned on the given
        columns — the Spark-idiomatic form of the reference's
        partition-variant layout (td-storage location.rs:36,
        `.../p/PARTITION.p` files): one directory per partition value
        instead of one file, so reads prune partitions at the scan
        (PartitionFilters) and a 100 TB table filtered to one day touches
        one directory.  Readers need no hint — spark.read.parquet
        discovers the partition columns from the layout."""
        if isinstance(frame, DataFrame):
            frame = TableFrame.from_spark(frame)
        version_id = S.new_system_id()
        props = S.FrameProperties(
            execution=execution_id or frame._props.execution,
            transaction=txn_id,
            version=version_id,
            timestamp=frame._props.timestamp,
        )
        auto = txn_id is None
        if auto:
            txn_id = self.meta.begin_transaction()
            props = S.FrameProperties(
                execution=props.execution, transaction=txn_id,
                version=version_id, timestamp=props.timestamp)
        path = self.version_path(collection, version_id, table, version_id)
        stored = S.materialize_for_store(frame._df, props)
        writer = stored.write.mode("errorifexists")
        if partition_by:
            missing = set(partition_by) - set(frame._df.columns)
            if missing:
                raise VersionResolutionError(
                    f"partition_by columns not in frame: {sorted(missing)}")
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        self.meta.add_version(
            collection, table, version_id, path, txn_id,
            execution_id=execution_id, schema_hash=_schema_hash(frame._df),
            row_count=_footer_row_count(path, frame._df.sparkSession),
        )
        if auto:
            self.meta.commit_transaction(txn_id)
        return version_id

    def merge(self, updates: TableFrame | DataFrame, collection: str,
              table: str, key_cols: list[str],
              delete_missing: bool = False,
              txn_id: str | None = None,
              partition_by: list[str] | None = None) -> str:
        """Keyed MERGE (upsert) producing a NEW version: rows of HEAD whose
        key appears in `updates` are replaced, new keys are inserted, and
        with `delete_missing=True` HEAD keys absent from `updates` are
        dropped (full-snapshot semantics).  Versioning is untouched — the
        merge is sugar over read-HEAD + anti-join + union + write, so time
        travel, vacuum, and diff all keep working.

        Plan shape: ONE hash anti-join of HEAD against the distinct update
        keys (broadcast when the batch is small — the common case), one
        union, one write.  No row-level state: at 100 TB this is the
        rewrite-the-affected-partitions pattern; pass `partition_by` so
        readers prune, and keep update batches partition-aligned when
        possible."""
        from ..errors import MissingColumnError, SchemaMismatchError

        up = updates.to_spark() if isinstance(updates, TableFrame) else updates
        if not key_cols:
            raise ValueError("merge: key_cols must be non-empty")
        missing = [k for k in key_cols if k not in up.columns]
        if missing:
            raise MissingColumnError(
                f"merge: key column(s) {missing} not in the update batch "
                f"(columns: {up.columns})")
        # a keyed upsert with duplicate keys INSIDE the batch would insert
        # both rows (silent key-uniqueness violation); raise like a SQL
        # MERGE on multi-row source matches.  One small job on the batch
        # side only — the batch is the small side of a merge by design.
        dup = (up.groupBy(*[up[k] for k in key_cols]).count()
               .filter("count > 1").take(1))
        if dup:
            key = {k: dup[0][k] for k in key_cols}
            raise ValueError(
                f"merge: update batch has multiple rows for key {key}; "
                "deduplicate the batch before merging")
        try:
            # user columns only on both sides: the stored system columns
            # (version/txn ids) must NOT survive into the new version —
            # write() stamps fresh ones
            head = self.read(up.sparkSession, collection, table).to_spark()
            if delete_missing:
                # full-snapshot semantics: the batch IS the table, so it
                # may evolve the schema exactly as a plain write() of the
                # same batch would — no head-vs-batch column check
                merged = up
            else:
                head_cols, up_cols = set(head.columns), set(up.columns)
                if head_cols != up_cols:
                    raise SchemaMismatchError(
                        "merge: update batch schema drifts from HEAD — "
                        f"missing {sorted(head_cols - up_cols)}, "
                        f"extra {sorted(up_cols - head_cols)}")
                survivors = head.join(up.select(*key_cols).distinct(),
                                      on=key_cols, how="left_anti")
                merged = survivors.unionByName(up)
        except VersionResolutionError:
            merged = up  # first version: plain write
        return self.write(TableFrame.from_spark(merged), collection, table,
                          txn_id=txn_id, partition_by=partition_by)

    def optimize(self, spark, collection: str, table: str,
                 target_bytes: int = 128 * 1024 * 1024,
                 txn_id: str | None = None) -> tuple[str, int]:
        """Compact HEAD's files into ~`target_bytes` outputs as a NEW
        version (content-identical; OPTIMIZE for the version store).  Old
        versions stay readable until `vacuum` reclaims them.  Returns
        (new_version_id, n_files).  At 100 TB run per partition-aligned
        table: compaction is a full rewrite, so schedule it on cold
        tables, not per-commit."""
        import math as _math

        head = self.read(spark, collection, table)
        df = head.to_spark()
        est = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        n = max(1, _math.ceil(int(est) / target_bytes))
        ver = self.write(TableFrame.from_spark(df.repartition(n)),
                         collection, table, txn_id=txn_id)
        return ver, n

    # -- read ----------------------------------------------------------
    def resolve_paths(self, collection: str, table: str,
                      versions: str = "HEAD",
                      as_of: str | None = None) -> list[str]:
        """Resolve version refs to parquet paths (oldest first) without
        touching Spark — the planner-side half of read(), used by isolated
        workers that scan the paths in their own session."""
        hist = self.meta.committed_history(collection, table, as_of=as_of)
        ids = [h[0] for h in hist]
        paths = {h[0]: h[1] for h in hist}
        chosen = resolve_refs(ids, parse_versions(versions))
        return [paths[v] for v in chosen]

    def resolve_uri_paths(self, uri: str, default_collection: str | None = None,
                          as_of: str | None = None) -> list[str]:
        u = TableURI.parse(uri)
        coll = u.collection or default_collection
        if coll is None:
            raise VersionResolutionError(f"uri {uri!r} needs a collection")
        versions = "HEAD" if u.versions is None else _versions_str(u.versions)
        return self.resolve_paths(coll, u.table, versions, as_of=as_of)

    def read(self, spark: SparkSession, collection: str, table: str,
             versions: str = "HEAD", as_of: str | None = None) -> TableFrame:
        """Read one or more versions (list/range refs concatenate, oldest
        first — the reference's multi-version dependency semantics)."""
        chosen = self.resolve_paths(collection, table, versions, as_of=as_of)
        dfs = [spark.read.parquet(p) for p in chosen]
        df = dfs[0]
        for d in dfs[1:]:
            df = df.unionByName(d, allowMissingColumns=True)
        return TableFrame._from_df(df)

    def read_uri(self, spark: SparkSession, uri: str,
                 default_collection: str | None = None,
                 as_of: str | None = None) -> TableFrame:
        u = TableURI.parse(uri)
        coll = u.collection or default_collection
        if coll is None:
            raise VersionResolutionError(f"uri {uri!r} needs a collection")
        versions = "HEAD" if u.versions is None else _versions_str(u.versions)
        return self.read(spark, coll, u.table, versions, as_of=as_of)

    def history(self, collection: str, table: str) -> list[str]:
        return [v for v, _ in self.meta.committed_history(collection, table)]

    # -- retention -----------------------------------------------------
    def vacuum(self, collection: str | None = None, table: str | None = None,
               keep_last: int | None = None) -> dict:
        """Reclaim dead storage:

        - version files of rolled-back/canceled transactions (never
          visible to any reader — their commit never happened);
        - with `keep_last=N`, committed versions beyond the newest N per
          table (metadata rows removed too, so `HEAD~n` past the horizon
          resolves to nothing rather than a dangling path).

        Versions of OPEN transactions are never touched (a concurrent run
        may still commit them).  Returns {"files_removed", "versions_
        pruned"}.  Metadata-driven and local/posix-path only by design:
        on object stores the same walk issues delete-prefix calls."""
        import shutil

        rows = self.meta.versions_with_status(collection, table)
        dead = [r for r in rows if r["status"] in ("rolled_back", "canceled")]
        pruned: list[dict] = []
        if keep_last is not None:
            if keep_last < 1:
                raise VersionResolutionError("keep_last must be >= 1")
            committed: dict[tuple[str, str], list[dict]] = {}
            for r in rows:                      # already in commit order
                if r["status"] == "committed":
                    committed.setdefault(
                        (r["collection"], r["table"]), []).append(r)
            for versions in committed.values():
                pruned.extend(versions[:-keep_last])
        files_removed = sum(
            self._remove_version_dir(r["path"]) for r in dead + pruned)
        self.meta.delete_versions([r["version_id"] for r in dead + pruned])
        return {"files_removed": files_removed,
                "versions_pruned": len(pruned)}

    def _remove_version_dir(self, path: str) -> int:
        import shutil

        if not os.path.isdir(path):
            return 0
        shutil.rmtree(path)
        # drop now-empty parents (d/<version>/t shells) up to root
        root = os.path.realpath(self.root)
        parent = os.path.dirname(os.path.realpath(path))
        while parent.startswith(root + os.sep) and not os.listdir(parent):
            os.rmdir(parent)
            parent = os.path.dirname(parent)
        return 1

    def drop_table(self, collection: str, table: str) -> dict:
        """Delete a table: metadata rows and every version's files
        (reference TABLE_DELETE, rest_urls/mod.rs:237)."""
        paths = self.meta.drop_table(collection, table)
        removed = sum(self._remove_version_dir(p) for p in paths)
        return {"versions_removed": len(paths), "files_removed": removed}


def _versions_str(v) -> str:
    from .versions import VersionList, VersionRange

    if isinstance(v, VersionList):
        return ",".join(str(x) for x in v.versions)
    if isinstance(v, VersionRange):
        return f"{v.start}..{v.end}"
    return str(v)
