"""TableInput / TableOutput: dependency-table IO against the TableStore
(reference _io/inputs/table_inputs.py:31, _io/outputs/table_outputs.py:29).

In the reference the server resolves versions and hands workers concrete
parquet locations; here the runner resolves through the metadata store at
plan time and these classes carry (uri, resolved frame) / (name, write)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from ..store.table_store import TableStore
from ..tableframe.frame import TableFrame


@dataclass
class TableInput:
    uri: str  # collection/table@versions

    def load(self, spark: SparkSession, store: TableStore,
             default_collection: str | None = None) -> TableFrame:
        return store.read_uri(spark, self.uri, default_collection)


@dataclass
class TableOutput:
    name: str  # table name within the function's collection

    def save(self, frame: TableFrame, store: TableStore, collection: str,
             txn_id: str | None = None, execution_id: str | None = None) -> str:
        return store.write(frame, collection, self.name, txn_id=txn_id,
                           execution_id=execution_id)
