"""Type-level screening of every registered oracle (r6 verdict item 8).

The driver's schema compare is dtype-aware: a DuckDB oracle that surfaces
HUGEINT (materializes as float64 under a fetchdf-style normalizer) or a
TIMESTAMP WITH TIME ZONE (tz-aware vs Spark's naive timestamps — the
stream_drift_events r6 red) fails schema/hash compare even when every
value agrees.  tools/check_queries.py now FAILs both classes at sweep
time; this test catches them earlier still — at plain pytest time, with
no Spark session — by DESCRIBE-ing all 357 oracles against DuckDB views
of the sf0.001 tables.  DuckDB plans (but does not execute) the query to
answer DESCRIBE, so the whole registry screens in seconds.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD_EXACT = {"HUGEINT", "UHUGEINT"}


@pytest.fixture(scope="module")
def oracle_types(sf_dir):
    from tabsdata_spark.queries import oracle_sql

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    out = {}
    for name, sql in oracle_sql().items():
        rel = con.sql(sql)
        out[name] = list(zip(rel.columns, (str(t) for t in rel.types)))
    con.close()
    return out


def test_no_oracle_surfaces_hugeint(oracle_types):
    bad = {n: [f"{c}:{t}" for c, t in cols if t in BAD_EXACT]
           for n, cols in oracle_types.items()}
    bad = {n: v for n, v in bad.items() if v}
    assert not bad, f"wrap in CAST(... AS BIGINT): {bad}"


def test_no_oracle_surfaces_tz_aware_types(oracle_types):
    """DuckDB to_timestamp()/now() return TIMESTAMP WITH TIME ZONE; Spark
    timestamps are naive.  Oracles must CAST(... AS TIMESTAMP)."""
    bad = {n: [f"{c}:{t}" for c, t in cols if "WITH TIME ZONE" in t]
           for n, cols in oracle_types.items()}
    bad = {n: v for n, v in bad.items() if v}
    assert not bad, f"wrap in CAST(... AS TIMESTAMP): {bad}"


def test_harness_guard_flags_tz_and_hugeint():
    """The sweep-time guard logic in tools/check_queries.py matches what
    this screen enforces: a to_timestamp projection and a bare SUM(int)
    both produce types the guard must flag."""
    con = duckdb.connect()
    rel = con.sql("SELECT to_timestamp(0) AS ts, SUM(x) AS s "
                  "FROM (SELECT 1::INTEGER AS x) GROUP BY ALL")
    types = [str(t) for t in rel.types]
    assert any("WITH TIME ZONE" in t for t in types)
    assert any(t in BAD_EXACT for t in types)
    fixed = con.sql(
        "SELECT CAST(to_timestamp(0) AS TIMESTAMP) AS ts, "
        "CAST(SUM(x) AS BIGINT) AS s "
        "FROM (SELECT 1::INTEGER AS x) GROUP BY ALL")
    ftypes = [str(t) for t in fixed.types]
    assert not any("WITH TIME ZONE" in t for t in ftypes)
    assert not any(t in BAD_EXACT for t in ftypes)
    con.close()
