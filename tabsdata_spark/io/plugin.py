"""User-extensible connector plugin ABCs (reference _io/plugin.py:40,298).

A SourcePlugin produces data (DataFrames directly, or parquet paths via a
working dir — the reference's chunk/stream contract, plugin.py:91-99) and
may return/update an offset for incremental ingest.  A DestinationPlugin
consumes result DataFrames.
"""

from __future__ import annotations

import abc
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class SourcePlugin(abc.ABC):
    """Subclass and implement `chunk`.  Return one of:
      - DataFrame, or list of DataFrames (multiple outputs)
      - str path / list of parquet paths (the reference's contract)
    Set `self.initial_values` before returning to persist offsets (the
    reference supports both attribute-set and return-style offsets)."""

    initial_values: dict[str, Any]

    def __init__(self):
        self.initial_values = {}

    @abc.abstractmethod
    def chunk(self, spark: SparkSession, working_dir: str):  # pragma: no cover
        ...

    def resolve(self, spark: SparkSession, working_dir: str) -> list[DataFrame]:
        out = self.chunk(spark, working_dir)
        items = out if isinstance(out, (list, tuple)) else [out]
        dfs = []
        for item in items:
            if isinstance(item, DataFrame):
                dfs.append(item)
            elif isinstance(item, str):
                dfs.append(spark.read.parquet(item))
            elif item is None:
                dfs.append(None)
            else:
                raise TypeError(f"SourcePlugin.chunk returned {type(item)}")
        return dfs


class DestinationPlugin(abc.ABC):
    """Subclass and implement `stream` to receive each result DataFrame."""

    @abc.abstractmethod
    def stream(self, spark: SparkSession, df: DataFrame,
               working_dir: str) -> None:  # pragma: no cover
        ...

    def write_all(self, spark: SparkSession, dfs: list[DataFrame],
                  working_dir: str) -> None:
        for df in dfs:
            self.stream(spark, df, working_dir)
