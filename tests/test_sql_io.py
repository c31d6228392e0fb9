"""JDBC source/destination: the pure-Python contract (param substitution,
query expansion, mode mapping).  Driving a real database needs a JDBC jar
absent from this container — the load()/save() paths stay construct-only."""

from __future__ import annotations

import pytest

from tabsdata_spark.io.sql_io import (
    MySQLSource,
    PostgresSource,
    SQLDestination,
    substitute_params,
)


def test_substitute_params_types():
    q = "SELECT * FROM t WHERE id > :last_id AND name = :name AND x IS :nil"
    out = substitute_params(q, {"last_id": 42, "name": "O'Brien", "nil": None})
    assert out == "SELECT * FROM t WHERE id > 42 AND name = 'O''Brien' AND x IS NULL"


def test_substitute_params_missing_raises():
    with pytest.raises(KeyError):
        substitute_params("SELECT :a", {})


def test_source_query_expansion():
    src = PostgresSource(
        uri="jdbc:postgresql://h/db",
        query=["SELECT 1 WHERE x > :off", "SELECT 2 WHERE y > :off"],
        initial_values={"off": 7},
    )
    assert src.queries() == ["SELECT 1 WHERE x > 7", "SELECT 2 WHERE y > 7"]


def test_flavor_drivers():
    assert "mysql" in MySQLSource(uri="u", query="q").flavor
    dest = SQLDestination(uri="u", destination_table="t", if_table_exists="replace")
    assert dest.if_table_exists == "replace"


def test_destination_bad_mode_raises():
    dest = SQLDestination(uri="u", destination_table="t", if_table_exists="nope")
    with pytest.raises(KeyError):
        dest.save(None)
