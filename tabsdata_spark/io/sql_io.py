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
    """`:param` -> inline literal, reference semantics
    (sql_inputs.py:779-787, `query.replace(f":{key}", str(value))`):

    - ONLY keys present in `values` are replaced; unknown `:tokens` pass
      through verbatim — a Postgres `::int` cast or a `'12:30'` time
      literal must never raise.
    - values inline with plain str() — no quoting (the reference example
      is `where id > :number` with `initial_values={"number": 2}`; users
      quote string placeholders in the query themselves).
    - token-boundary regex matching instead of raw str.replace, so a key
      that is a prefix of another (`:id` / `:id2`) can never corrupt the
      longer placeholder.
    - deliberate deviation: None inlines as SQL NULL — the reference
      would inline the Python repr 'None', which is never valid SQL.
    """

    def repl(m: re.Match) -> str:
        key = m.group(1)
        if key not in values:
            return m.group(0)
        v = values[key]
        return "NULL" if v is None else str(v)

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

    #: reference OffsetReturn.FUNCTION (sql_inputs.py:193-199): when
    #: initial_values is set, the registered function returns the NEW
    #: offsets dict as its trailing element; the engine pops and persists
    #: it, and restores it into initial_values on the next run.
    offset_return = "function"

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
