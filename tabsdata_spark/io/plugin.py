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
    """Subclass and implement `chunk`.  Return one of (the reference's
    chunk contract, _io/plugin.py:91-99 + execution_utils.load_sources):
      - DataFrame, or str parquet path (single output)
      - a list where each element maps to one function parameter in
        positional order; an element that is itself a LIST of paths makes
        that parameter receive a LIST of frames
        (execution_utils.load_sources_from_list)
      - None elements yield None parameters
    Relative paths resolve against `working_dir` (the reference joins
    working_dir in make_tableframe_context, execution_utils.py:158-165).
    Set `self.initial_values` before returning to persist offsets — the
    reference's ATTRIBUTE offset mode (_io/plugin.py OffsetReturn); the
    engine restores persisted offsets into `initial_values` before each
    run (plugin.py _run: `self.initial_values = current_initial_values`)."""

    initial_values: dict[str, Any]
    #: reference OffsetReturn: 'attribute' (offsets read back from
    #: initial_values after the run) or 'function' (the user function
    #: returns a trailing dict of new offsets — the SQL-source mode)
    offset_return: str = "attribute"

    def __init__(self):
        self.initial_values = {}

    @abc.abstractmethod
    def chunk(self, spark: SparkSession, working_dir: str):  # pragma: no cover
        ...

    def resolve(self, spark: SparkSession, working_dir: str) -> list:
        import os

        out = self.chunk(spark, working_dir)
        items = out if isinstance(out, (list, tuple)) else [out]

        def read(path: str) -> DataFrame:
            # os.path.join returns `path` unchanged when it is absolute —
            # same resolution as the reference's make_tableframe_context
            return spark.read.parquet(os.path.join(working_dir, path))

        def one(item):
            if isinstance(item, DataFrame):
                return item
            if isinstance(item, str):
                return read(item)
            if item is None:
                return None
            raise TypeError(f"SourcePlugin.chunk returned {type(item)}")

        dfs = []
        for item in items:
            if isinstance(item, (list, tuple)):
                # one parameter <- multiple files: that argument becomes a
                # LIST of frames (reference load_sources_from_list)
                dfs.append([one(x) for x in item])
            else:
                dfs.append(one(item))
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
