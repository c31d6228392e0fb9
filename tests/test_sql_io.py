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
    """Reference semantics (sql_inputs.py:779-787): raw str() inlining —
    users quote string placeholders in the query themselves; None is the
    one deviation (SQL NULL instead of the Python repr 'None')."""
    q = "SELECT * FROM t WHERE id > :last_id AND ts > ':ts' AND x IS :nil"
    out = substitute_params(q, {"last_id": 42, "ts": "2024-01-01", "nil": None})
    assert out == "SELECT * FROM t WHERE id > 42 AND ts > '2024-01-01' AND x IS NULL"


def test_substitute_params_unknown_tokens_pass_through():
    """Only provided keys are replaced (reference replaces key-by-key);
    a Postgres cast or time literal must never raise."""
    q = "SELECT x::int, ':not_a_param', t FROM s WHERE id > :off AND h = '12:30'"
    out = substitute_params(q, {"off": 7})
    assert out == "SELECT x::int, ':not_a_param', t FROM s WHERE id > 7 AND h = '12:30'"


def test_substitute_params_prefix_keys_do_not_collide():
    """Token-boundary matching: :id must never corrupt :id2 (the
    reference's raw str.replace is order-sensitive here)."""
    out = substitute_params("SELECT :id, :id2", {"id": 1, "id2": 2})
    assert out == "SELECT 1, 2"


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
