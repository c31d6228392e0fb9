"""Driver-parity regression net: every registered query must run on a
VANILLA Spark 4 session (ANSI on, no legacy parquet confs, default
timezone) — not just under get_spark()'s tuned session.

Round-1 lesson: the driver's correctness harness uses an unconfigured
SparkSession, where `spark.sql.ansi.enabled` defaults to true and
`spark.sql.legacy.parquet.nanosAsLong` is unset.  Six queries that were
green under get_spark() died there (CAST_INVALID_INPUT,
PARQUET_TYPE_ILLEGAL, ARITHMETIC_OVERFLOW).  This suite reproduces the
driver's session inside the shared test JVM by cloning a session and
unsetting every conf get_spark() tunes, so that breakage is caught by
pytest before the driver sees it.

Contract (NOTES.md): get_spark() is an optimization, never a correctness
dependency.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

import tabsdata_spark as td

# Session confs get_spark() sets that could mask vanilla behavior.  Static
# confs (driver memory, UI) don't affect semantics and can't be unset.
_TUNED_KEYS = [
    "spark.sql.adaptive.enabled",
    "spark.sql.adaptive.coalescePartitions.enabled",
    "spark.sql.adaptive.skewJoin.enabled",
    "spark.sql.adaptive.localShuffleReader.enabled",
    "spark.sql.execution.arrow.pyspark.enabled",
    "spark.sql.ansi.enabled",
    "spark.sql.session.timeZone",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.cbo.enabled",
    "spark.sql.legacy.parquet.nanosAsLong",
]


@pytest.fixture(scope="module")
def vanilla(spark):
    ns = spark.newSession()
    for key in _TUNED_KEYS:
        try:
            ns.conf.unset(key)
        except Exception:
            pass
    # keep test shuffle width small (perf only; not semantics)
    ns.conf.set("spark.sql.shuffle.partitions", "8")
    assert ns.conf.get("spark.sql.ansi.enabled") == "true", \
        "vanilla clone failed to restore Spark 4 ANSI default"
    # Point active-session tracking (used by Expr's ANSI detection) at the
    # vanilla clone, as it would be in the driver's single-session process.
    prev = SparkSession.getActiveSession()
    SparkSession._activeSession = ns
    ns._jvm.SparkSession.setActiveSession(ns._jsparkSession)
    yield ns
    SparkSession._activeSession = prev
    if prev is not None:
        prev._jvm.SparkSession.setActiveSession(prev._jsparkSession)


def test_full_registry_runs_on_vanilla_session(vanilla, sf_dir):
    """Sweep the whole queries() registry: each must build and execute.
    (Value-level oracle checks run in tools/check_queries.py --vanilla;
    here we gate on 'no session-dependent crash', the r1 failure mode.)

    The 357 sweeps are independent, so they run from a small thread pool
    (Spark schedules concurrent jobs; pinned-thread mode maps each Python
    thread to one JVM thread, where the initializer re-activates the
    vanilla session so per-thread ANSI detection sees the same session
    the driver's single-threaded process would).  Same queries, same
    assertion — this only overlaps the waiting."""
    from concurrent.futures import ThreadPoolExecutor

    from tabsdata_spark.queries import queries

    def _activate():
        vanilla._jvm.SparkSession.setActiveSession(vanilla._jsparkSession)

    def run_one(item):
        name, fn = item
        try:
            fn(vanilla, sf_dir).count()
            return None
        except Exception as e:  # noqa: BLE001 - collect all, report once
            return f"{name}: {type(e).__name__}: {str(e)[:160]}"

    with ThreadPoolExecutor(max_workers=6, initializer=_activate) as ex:
        failures = [f for f in ex.map(run_one, queries().items())
                    if f is not None]
    assert not failures, "vanilla-session failures:\n" + "\n".join(failures)


def test_cast_semantics_on_ansi_session(vanilla):
    tf = td.TableFrame.from_spark(
        vanilla.createDataFrame([("12",), ("abc",), (None,)], "s string"))
    out = tf.select(td.col("s").cast("long").alias("v")).to_spark().collect()
    assert [r["v"] for r in out] == [12, None, None]


def test_strict_cast_raises_on_ansi_session(vanilla):
    tf = td.TableFrame.from_spark(
        vanilla.createDataFrame([("abc",)], "s string"))
    with pytest.raises(Exception):
        tf.select(td.col("s").cast("long", strict=True)).to_spark().collect()


def test_str_to_integer_non_strict_on_ansi_session(vanilla):
    tf = td.TableFrame.from_spark(
        vanilla.createDataFrame([("7",), ("x",)], "s string"))
    out = tf.select(
        td.col("s").str.to_integer(strict=False).alias("v")).to_spark().collect()
    assert [r["v"] for r in out] == [7, None]


def test_events_load_on_vanilla_session(vanilla, sf_dir):
    from tabsdata_spark.queries import load_events

    tf = load_events(vanilla, sf_dir)
    schema = dict(tf.to_spark().dtypes)
    assert schema.get("ts", "").startswith("timestamp")


def _driver_greens(rounds):
    import json

    out = set()
    for r in rounds:
        for name, row in json.load(open(f"CORRECTNESS_r{r}.json")).items():
            if row.get("rows_match") and row.get("schema_match") is not False \
                    and row.get("hash_match") is not False:
                out.add(name)
    return out


def test_driver_window_covers_never_verified_queries():
    """Guard the r9 rotation lineage: _PRIORITY_R9 must remain the 11
    never-driver-verified queries (through r8) plus 39 r1-era greens;
    CORRECTNESS_r09 must show all 50 green (the window that closed the
    never-verified pool)."""
    from tabsdata_spark import queries as registry

    window = registry._PRIORITY_R9
    assert len(window) == 50
    all_green_r8 = _driver_greens(("01", "02", "03", "04", "05", "06",
                                   "07", "08"))
    never = set(window[:11])
    rechecks = set(window[11:])
    assert never & all_green_r8 == set(), never & all_green_r8
    assert rechecks <= _driver_greens(("01",))
    # r9 verified the whole window green
    assert set(window) <= _driver_greens(("09",))


def test_driver_window_r10_is_oldest_unrechecked_greens():
    """Guard the r10 rotation lineage: _PRIORITY_R10 must remain the 50
    oldest r2–r5-era greens (by first-green round, then name) not
    re-checked in the r9 window; CORRECTNESS_r10 shows all 50 green."""
    from tabsdata_spark import queries as registry

    window = registry._PRIORITY_R10
    assert len(window) == 50

    # every window name first went green in rounds 2-5 and was NOT part
    # of the r9 window (i.e. not already re-checked under the strict
    # harness)
    r1 = _driver_greens(("01",))
    r2_5 = _driver_greens(("02", "03", "04", "05"))
    for n in window:
        assert n in r2_5 and n not in r1, n
        assert n not in registry._PRIORITY_R9, n

    # r10 verified the whole window green
    assert set(window) <= _driver_greens(("10",))


def test_driver_window_r11_leads_with_optimized_queries():
    """The driver snapshots queries()[0:50].  Guard the r11 rotation
    (r10 verdict item 4): the window must lead with the r10/r11-optimized
    query paths so every touched path gets driver-side oracle
    confirmation, then advance the oldest-green re-verification
    frontier."""
    from tabsdata_spark import queries as registry

    names = list(registry.queries())
    window = names[:50]
    assert window == registry._PRIORITY_R11
    assert len(window) == 50
    oracles = registry.oracle_sql()
    assert all(n in oracles for n in window)

    # the optimized paths from the two optimization rounds lead the window
    optimized = {"pagerank_orders", "ppr_suppliers", "kcore_orders",
                 "hits_customer_supplier", "pagerank_event_transitions",
                 "cosine_histogram_emb", "semantic_decontam_emb",
                 "bloom_fpr_docs", "q1_pricing_summary", "text_quality"}
    assert optimized <= set(window[:26])

    # the rotation-filler tail never re-checks the freshest (r10-window)
    # evidence; overlap is allowed only in the optimized lead section,
    # where re-confirmation is the point (e.g. pagerank_event_transitions
    # was r10-verified AND r11-touched)
    assert set(window[26:]) & set(registry._PRIORITY_R10) == set()

    # cumulative coverage: every registry query is green in some prior
    # round (the never-verified pool stays zero)
    all_green = _driver_greens(
        ("01", "02", "03", "04", "05", "06", "07", "08", "09", "10"))
    assert set(names) <= all_green, set(names) - all_green
