"""Table read services: sample / download / schema.

Port of the reference's REST table services
(server/libraries/td-services/src/table/services/{sample,download,schema}.rs
and layers/sample.rs:38-116): scan the stored version, optionally run user
SQL against it (sample.rs:90-94 uses Polars SQLContext; here the table
registers as a temp view and `spark.sql` runs it — strictly more SQL),
drop system columns (td-tableframe/src/common.rs:8-22), slice offset/len,
encode csv/json/parquet.

Scale note: `sample` LIMITs before collecting (driver sees at most
offset+len rows); `download` never collects — it returns the DataFrame for
a distributed write.
"""

from __future__ import annotations

import io as _io
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..tableframe._system import is_system_column
from .table_store import TableStore


def _user_df(df: DataFrame) -> DataFrame:
    keep = [c for c in df.columns if not is_system_column(c)]
    return df.select(*keep)


def _load(spark: SparkSession, store: TableStore, uri: str,
          sql: str | None = None) -> DataFrame:
    tf = store.read_uri(spark, uri)
    df = _user_df(tf.df)
    if sql:
        name = uri.split("/")[-1].split("@")[0]
        df.createOrReplaceTempView(name)
        df = spark.sql(sql)
        df = _user_df(df)
    return df


def table_schema(spark: SparkSession, store: TableStore, uri: str) -> list[dict]:
    """GET .../tables/{t}/schema: user-facing fields only."""
    df = _load(spark, store, uri)
    return [{"name": f.name, "type": f.dataType.simpleString()}
            for f in df.schema.fields]


def sample_table(spark: SparkSession, store: TableStore, uri: str,
                 offset: int = 0, length: int = 100,
                 sql: str | None = None, fmt: str = "rows") -> Any:
    """GET .../tables/{t}/sample?offset&len&format&sql.

    fmt: 'rows' -> list of dicts; 'csv'/'json' -> encoded string.
    """
    df = _load(spark, store, uri, sql)
    rows = df.limit(offset + length).collect()[offset:]
    dicts = [r.asDict(recursive=True) for r in rows]
    if fmt == "rows":
        return dicts
    if fmt == "json":
        import json
        return "\n".join(json.dumps(d, default=str) for d in dicts)
    if fmt == "csv":
        import csv
        buf = _io.StringIO()
        w = csv.DictWriter(buf, fieldnames=df.columns)
        w.writeheader()
        w.writerows({k: ("" if v is None else v) for k, v in d.items()}
                    for d in dicts)
        return buf.getvalue()
    raise ValueError(f"unknown sample format: {fmt}")


def download_table(spark: SparkSession, store: TableStore, uri: str,
                   dest_path: str, fmt: str = "parquet",
                   sql: str | None = None) -> str:
    """GET .../tables/{t}/download — distributed write, no driver collect."""
    df = _load(spark, store, uri, sql)
    df.write.mode("overwrite").format(fmt) \
        .options(**({"header": "true"} if fmt == "csv" else {})) \
        .save(dest_path)
    return dest_path
