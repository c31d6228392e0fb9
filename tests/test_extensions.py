"""asof_join extension: backward/forward, equal-ts inclusivity, suffixes."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from tabsdata_spark.extensions import asof_join


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_backward_basic(spark):
    quotes = spark.createDataFrame(
        [("A", _t(0), 10.0), ("A", _t(5), 11.0), ("B", _t(3), 20.0)],
        ["sym", "ts", "px"])
    trades = spark.createDataFrame(
        [("A", _t(4), 100), ("A", _t(5), 200), ("A", _t(7), 300),
         ("B", _t(1), 400), ("B", _t(9), 500)],
        ["sym", "ts", "qty"])
    out = asof_join(trades, quotes, on="ts", by="sym")
    got = {(r.sym, r.qty): r.px for r in out.collect()}
    assert got == {("A", 100): 10.0,   # last quote at or before t4 is t0
                   ("A", 200): 11.0,   # equal ts matches (inclusive)
                   ("A", 300): 11.0,
                   ("B", 400): None,   # no quote yet -> left-join null
                   ("B", 500): 20.0}


def test_asof_forward(spark):
    right = spark.createDataFrame([(1, _t(5), "x")], ["k", "ts", "v"])
    left = spark.createDataFrame(
        [(1, _t(3)), (1, _t(5)), (1, _t(7))], ["k", "ts"])
    out = asof_join(left, right, on="ts", by="k", strategy="forward")
    got = {r.ts: r.v for r in out.collect()}
    assert got == {_t(3): "x", _t(5): "x", _t(7): None}


def test_asof_suffix_and_no_by(spark):
    left = spark.createDataFrame([(_t(2), "l")], ["ts", "v"])
    right = spark.createDataFrame([(_t(1), "r")], ["ts", "v"])
    out = asof_join(left, right, on="ts")
    row = out.first()
    assert row.v == "l" and row.v_right == "r" and row.ts_right == _t(1)


def test_range_join_matches_cross_filter(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    signups = (ev.filter(F.col("event_type") == "signup")
               .select("user_id", F.col("ts").alias("s_start"),
                       (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("s_end")))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", F.col("ts").alias("cts"),
                      F.col("event_id").alias("ce")))

    from tabsdata_spark.extensions import range_join
    fast = range_join(clicks, signups, "cts", "s_start", "s_end", by="user_id")
    naive = (clicks.join(signups, "user_id")
             .filter(F.col("cts").between(F.col("s_start"), F.col("s_end"))))
    assert fast.count() == naive.count() > 0


def test_hierarchical_rollup_single_scan(spark, sf_dir):
    """Coarser levels must re-aggregate the finer output, not re-scan raw."""
    from tabsdata_spark.extensions import hierarchical_rollup

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    out = hierarchical_rollup(ev, "ts", "value")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every union branch must read the cached finest rollup, not raw files
    # (the plan string repeats the cached relation's lineage, so count
    # InMemoryTableScan branches rather than FileScan occurrences)
    assert plan.count("InMemoryTableScan") >= 3
    # totals agree across resolutions
    import pyspark.sql.functions as Fn
    tot = {r.resolution: (r.n, round(r.total, 4)) for r in
           out.groupBy("resolution")
              .agg(Fn.sum("n").alias("n"),
                   Fn.sum(Fn.col("total").cast("decimal(18,4)"))
                     .cast("double").alias("total")).collect()}
    assert tot["hour"] == tot["day"] == tot["month"]


def test_asof_join_nearest_strategy(spark):
    from tabsdata_spark.extensions import asof_join
    left = spark.createDataFrame(
        [(1, 10), (1, 100), (2, 50)], ["k", "t"])
    right = spark.createDataFrame(
        [(1, 7, "a"), (1, 12, "b"), (1, 90, "c"), (2, 500, "z")],
        ["k", "t", "v"])
    out = {(r.k, r.t): r.v for r in
           asof_join(left, right, on="t", by="k",
                     strategy="nearest").collect()}
    assert out[(1, 10)] == "b"     # dist 2 forward beats dist 3 backward
    assert out[(1, 100)] == "c"    # only backward nearby
    assert out[(2, 50)] == "z"     # forward-only match (backward empty)


def test_asof_join_nearest_tie_prefers_backward(spark):
    from tabsdata_spark.extensions import asof_join
    left = spark.createDataFrame([(1, 10)], ["k", "t"])
    right = spark.createDataFrame(
        [(1, 8, "early"), (1, 12, "late")], ["k", "t", "v"])
    out = asof_join(left, right, on="t", by="k",
                    strategy="nearest").collect()
    assert out[0].v == "early"     # equal distance 2 -> backward wins


def test_funnel_orders_and_window(spark):
    import datetime as dt

    from tabsdata_spark.extensions import funnel

    t = lambda h: dt.datetime(2024, 1, 1, h)
    rows = [
        # u1 completes in order within window
        (1, t(0), "a"), (1, t(1), "b"), (1, t(2), "c"),
        # u2 does b BEFORE a: chain must not count the early b
        (2, t(0), "b"), (2, t(1), "a"),
        # u3 completes but c lands outside the 3h window
        (3, t(0), "a"), (3, t(1), "b"), (3, t(9), "c"),
        # u4 never starts (no a)
        (4, t(0), "c"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, et string")
    out = {r["user_id"]: r for r in
           funnel(ev, "user_id", "ts", "et", ["a", "b", "c"],
                  within="3 HOUR").collect()}
    assert out[1]["reached_steps"] == 3
    assert out[2]["reached_steps"] == 1 and out[2]["t_2"] is None
    assert out[3]["reached_steps"] == 2 and out[3]["t_3"] is None
    assert 4 not in out


def test_retention_cohorts_matrix(spark):
    import datetime as dt

    from tabsdata_spark.extensions import retention_cohorts

    d = lambda day: dt.datetime(2024, 1, day, 12)
    rows = [
        (1, d(1)), (1, d(8)), (1, d(15)),   # cohort w0, back w1 and w2
        (2, d(1)),                           # cohort w0, never back
        (3, d(8)), (3, d(22)),               # cohort w1, back w2 later
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r["cohort"].day, r["period_offset"]): (r["n_users"], r["retention"])
           for r in retention_cohorts(ev, "user_id", "ts", "week").collect()}
    assert out[(1, 0)] == (2, 1.0)          # w0 cohort: both users at offset 0
    assert out[(1, 1)] == (1, 0.5)          # only user 1 returns next week
    assert out[(1, 2)] == (1, 0.5)
    assert out[(8, 0)] == (1, 1.0)          # user 3's own cohort
    assert out[(8, 2)] == (1, 1.0)


def test_rolling_zscore_flags_only_the_spike(spark):
    from tabsdata_spark.extensions import rolling_zscore
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: flat 10.0 baseline, then a 100.0 spike at the end
    for i in range(12):
        v = 100.0 if i == 11 else 10.0 + (i % 3) * 0.1
        rows.append((i, 1, t0 + dt.timedelta(minutes=i), v))
    # user 2: too few points for min_periods
    for i in range(4):
        rows.append((100 + i, 2, t0 + dt.timedelta(minutes=i), 50.0))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    out = rolling_zscore(df, "user_id", "ts", "value", window=20,
                         min_periods=8, threshold=2.5,
                         tie_cols=["event_id"]).collect()
    assert [r.event_id for r in out] == [11]
    assert out[0].zscore > 2.5
    assert abs(out[0].roll_mean - 10.1) < 0.05


def test_rolling_zscore_frame_excludes_current_row(spark):
    from tabsdata_spark.extensions import rolling_zscore
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # 9 identical values then one outlier: trailing frame for the outlier
    # holds only the 9 clean points, so std is tiny and z explodes; if the
    # frame leaked the current row the mean would shift and z would shrink
    rows = [(i, 1, t0 + dt.timedelta(seconds=i),
             20.0 + (0.2 if i % 2 else -0.2)) for i in range(9)]
    rows.append((9, 1, t0 + dt.timedelta(seconds=9), 25.0))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    out = rolling_zscore(df, "user_id", "ts", "value", window=20,
                         min_periods=8, threshold=2.5).collect()
    assert [r.event_id for r in out] == [9]
    assert abs(out[0].roll_mean - 20.0) < 0.05


def test_cooccurrence_lift_counts_and_ratios(spark):
    from tabsdata_spark.extensions import cooccurrence_lift

    rows = [(1, "a"), (1, "b"), (1, "a"),      # repeat collapses
            (2, "a"), (2, "b"),
            (3, "a"), (3, "c"),
            (4, "b")]
    df = spark.createDataFrame(rows, "b long, i string")
    out = {(r.item_a, r.item_b): r
           for r in cooccurrence_lift(df, "b", "i").collect()}
    ab = out[("a", "b")]
    assert ab.n_ab == 2
    assert ab.support == 0.5                       # 2 of 4 baskets
    assert ab.confidence == pytest.approx(2 / 3)   # n_a = 3
    assert ab.lift == pytest.approx(2 * 4 / (3 * 3))
    ac = out[("a", "c")]
    assert ac.n_ab == 1 and ac.lift == pytest.approx(1 * 4 / (3 * 1))
    assert ("b", "c") not in out                   # never co-occur


def test_resample_ffill_grid_and_fill(spark):
    from tabsdata_spark.extensions import resample_ffill
    import datetime as dt

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    rows = [(1, t(0, 30), 10.0), (1, t(3, 15), 30.0),
            (2, t(1, 0), 5.0)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = {(r.k, r.grid_ts): r.value_ffill
           for r in resample_ffill(df, "k", "ts", "v").collect()}
    # user 1 grid: hours 0..3; hour 0 precedes the first obs -> null
    assert out[(1, t(0))] is None
    assert out[(1, t(1))] == 10.0 and out[(1, t(2))] == 10.0
    assert out[(1, t(3))] == 10.0   # obs at 3:15 is after the 3:00 point
    # user 2: single grid point AT the observation instant sees it
    assert out[(2, t(1))] == 5.0
    assert len(out) == 5


def test_markov_transitions_probabilities(spark):
    import datetime as dt

    import pytest

    from tabsdata_spark.extensions import markov_transitions

    t0 = dt.datetime(2024, 1, 1)
    seq = ["a", "b", "a", "c", "a", "b"]          # a->b x2, b->a, a->c, c->a
    rows = [(1, i, t0 + dt.timedelta(minutes=i), s)
            for i, s in enumerate(seq)]
    df = spark.createDataFrame(rows, "u long, eid long, ts timestamp, s string")
    out = {(r.state, r.next_state): r for r in markov_transitions(
        df, "u", "ts", "s", tie_cols=["eid"]).collect()}
    assert out[("a", "b")].n_ab == 2
    assert out[("a", "b")].p == pytest.approx(2 / 3)
    assert out[("a", "c")].p == pytest.approx(1 / 3)
    assert out[("b", "a")].p == 1.0 and out[("c", "a")].p == 1.0
    # last event has no successor: 5 transitions total
    assert sum(r.n_ab for r in out.values()) == 5


def test_session_paths_orders_and_counts(spark):
    import datetime as dt

    from tabsdata_spark.extensions import session_paths

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1: two sessions split by a 2-hour gap, both path a>b
    for start in (t0, t0 + dt.timedelta(hours=3)):
        for i, e in enumerate(["a", "b"]):
            rows.append((eid, 1, start + dt.timedelta(minutes=i), e))
            eid += 1
    # user 2: one session with path a>b>c
    for i, e in enumerate(["a", "b", "c"]):
        rows.append((eid, 2, t0 + dt.timedelta(minutes=i), e))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, e string")
    out = {r.path: r.n_sessions for r in session_paths(
        df, "user_id", "ts", "e", gap_seconds=1800,
        tie_cols=["event_id"]).collect()}
    assert out == {"a>b": 2, "a>b>c": 1}


def test_session_paths_gap_boundary_is_exclusive(spark):
    import datetime as dt

    from tabsdata_spark.extensions import session_paths

    t0 = dt.datetime(2024, 1, 1)
    # gap of exactly 1800s does NOT split; 1800.000001s does
    rows = [(0, 1, t0, "a"),
            (1, 1, t0 + dt.timedelta(seconds=1800), "b"),
            (2, 1, t0 + dt.timedelta(seconds=3600, microseconds=1), "c")]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, e string")
    out = sorted(r.path for r in session_paths(
        df, "user_id", "ts", "e", tie_cols=["event_id"]).collect())
    assert out == ["a>b", "c"]


def test_growth_curve_new_and_cumulative(spark):
    import datetime as dt

    from tabsdata_spark.extensions import growth_curve

    d = lambda day, h=0: dt.datetime(2024, 1, day, h)
    rows = [(1, d(1)), (1, d(3)),        # user 1 first seen day 1
            (2, d(1, 5)),                # day 1
            (3, d(2)),                   # day 2
            (4, d(4)), (4, d(1, 23))]    # user 4 first seen day 1 (23:00)
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    out = [(str(r.first_day), r.new_keys, r.cum_keys)
           for r in growth_curve(df, "u", "ts").collect()]
    assert out == [("2024-01-01", 3, 3), ("2024-01-02", 1, 4)]


def test_rolling_active_window_semantics(spark):
    import datetime as dt

    from tabsdata_spark.extensions import rolling_active

    d = lambda day: dt.datetime(2024, 1, day, 12)
    # user 1 active day 1; user 2 active days 1 and 9; user 3 day 3
    rows = [(1, d(1)), (2, d(1)), (2, d(9)), (3, d(3))]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    out = {str(r.day): r.active_keys
           for r in rolling_active(df, "u", "ts", window_days=7).collect()}
    assert out["2024-01-01"] == 2          # users 1, 2
    assert out["2024-01-03"] == 3          # 1, 2 (from day1) + 3
    assert out["2024-01-07"] == 3          # day-1 activity still in window
    assert out["2024-01-08"] == 1          # only day-3 activity remains
    assert out["2024-01-09"] == 2          # user 3 (day 3) + user 2 (day 9)
    assert "2024-01-10" not in out         # beyond max observed day


def test_gini_by_group_extremes(spark):
    from tabsdata_spark.extensions import gini_by_group

    # group e: perfectly equal -> gini 0; group u: one key owns all value
    rows = [("e", k, 10.0) for k in range(1, 5)]
    rows += [("u", 1, 0.0), ("u", 2, 0.0), ("u", 3, 0.0), ("u", 4, 40.0)]
    df = spark.createDataFrame(rows, "g string, k long, v double")
    out = {r.g: r for r in gini_by_group(df, "g", "k", "v").collect()}
    assert out["e"].gini == 0.0
    # n=4, all mass at top rank: G = 2*4/(4*1) - 5/4 = 0.75
    assert out["u"].gini == 0.75
    assert out["e"].total_value == 40.0 and out["u"].total_value == 40.0


def test_rfm_segments_extreme_profiles(spark):
    import datetime as dt

    from tabsdata_spark.extensions import rfm_segments

    d = lambda day: dt.datetime(2024, 1, day)
    rows = []
    # key 1: recent, frequent, big spender -> best segment 444
    for i in range(8):
        rows.append((1, d(20 + i), 1000.0))
    # key 2: stale, single small order -> worst segment 111
    rows.append((2, d(1), 1.0))
    # two middling keys so quartiles spread
    rows += [(3, d(10), 50.0), (3, d(12), 50.0),
             (4, d(14), 200.0), (4, d(15), 200.0), (4, d(16), 200.0)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = {r.segment: r for r in rfm_segments(
        df, "k", "ts", "v").collect()}
    assert out["444"].n_keys == 1 and out["444"].total_value == 8000.0
    assert out["111"].n_keys == 1 and out["111"].total_value == 1.0
    assert sum(r.n_keys for r in out.values()) == 4


def test_weekly_seasonality_iso_weekday_and_share(spark):
    import datetime as dt

    from tabsdata_spark.extensions import weekly_seasonality

    # 2024-01-01 is a Monday (ISO weekday 0)
    rows = [("a", dt.datetime(2024, 1, 1), 10.0),   # Mon
            ("a", dt.datetime(2024, 1, 8), 30.0),   # Mon
            ("a", dt.datetime(2024, 1, 3), 7.0)]    # Wed
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = {r.weekday: r for r in weekly_seasonality(
        df, "g", "ts", "v").collect()}
    assert out[0].n == 2 and out[0].mean_value == 20.0
    assert out[2].n == 1 and out[2].mean_value == 7.0
    assert out[0].share == pytest.approx(2 / 3, abs=1e-6)


def test_rolling_zscore_constant_window_drops_not_crashes(spark):
    # ADVICE r3: a window of >= min_periods IDENTICAL values makes var 0
    # (heartbeat metrics); the degenerate rows must be dropped, not raise
    # DIVIDE_BY_ZERO (ANSI) or flag NaN/Inf z-scores (non-ANSI)
    from tabsdata_spark.extensions import rolling_zscore
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, 1, t0 + dt.timedelta(seconds=i), 7.0) for i in range(12)]
    rows.append((12, 1, t0 + dt.timedelta(seconds=12), 99.0))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    out = rolling_zscore(df, "user_id", "ts", "value", window=20,
                         min_periods=8, threshold=2.5,
                         tie_cols=["event_id"]).collect()
    # the spike scores against a zero-variance trailing window -> dropped;
    # nothing else deviates, so the result is empty (and nothing crashed)
    assert out == []


def test_rolling_zscore_large_values_exact_no_overflow(spark):
    # ADVICE r3: micros-quantized m*m crosses 2^63 once |value| > ~3037;
    # the squared term must go through decimal(38,0), not 64-bit long
    from tabsdata_spark.extensions import rolling_zscore
    import datetime as dt
    import math

    t0 = dt.datetime(2024, 1, 1)
    base = [1.0e7 + (i % 3) * 25_000.0 for i in range(10)]   # m ~ 1e13
    rows = [(i, 1, t0 + dt.timedelta(seconds=i), v)
            for i, v in enumerate(base)]
    rows.append((10, 1, t0 + dt.timedelta(seconds=10), 2.0e7))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    out = rolling_zscore(df, "user_id", "ts", "value", window=20,
                         min_periods=8, threshold=2.5,
                         tie_cols=["event_id"]).collect()
    assert [r.event_id for r in out] == [10]
    # exact replay of the integer-moment arithmetic in Python (arbitrary
    # precision): identical IEEE derivation => identical rounded z
    w = [int(math.floor(v * 1e6 + 0.5)) for v in base]
    n = float(len(w))
    s1, s2 = float(sum(w)), float(sum(x * x for x in w))
    mean = (s1 / 1e6) / n
    var = ((s2 - s1 * s1 / n) / (n - 1)) / 1e12
    z = (2.0e7 - mean) / math.sqrt(var)
    assert out[0].zscore == round(z, 6)


def test_changepoint_detect_finds_level_shift(spark):
    from tabsdata_spark.extensions import changepoint_detect
    import datetime as dt

    rows = []
    for d in range(10):
        v = 10.0 if d < 6 else 50.0   # shift after day 5
        for i in range(3):
            rows.append((d * 3 + i, "k",
                         dt.datetime(2024, 1, 1 + d, 12, 0, i), v))
    df = spark.createDataFrame(
        rows, "event_id long, k string, ts timestamp, value double")
    r = changepoint_detect(df, "k", "ts", "value").collect()[0]
    assert r.change_day == dt.date(2024, 1, 6)   # last day of the left mean
    assert r.mean_before == 10.0 and r.mean_after == 50.0
    assert (r.n_before, r.n_after) == (18, 12)


def test_disorder_report_counts_late_rows(spark):
    from tabsdata_spark.extensions import disorder_report
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0 + dt.timedelta(seconds=10)),
        (2, 1, t0 + dt.timedelta(seconds=20)),
        (3, 1, t0 + dt.timedelta(seconds=5)),    # 15s late vs max-so-far
        (4, 1, t0 + dt.timedelta(seconds=30)),
        (5, 2, t0),                               # ordered key: no lates
        (6, 2, t0 + dt.timedelta(seconds=1)),
    ]
    df = spark.createDataFrame(rows, "event_id long, u long, ts timestamp")
    got = {r.u: r for r in
           disorder_report(df, "u", "event_id", "ts").collect()}
    assert got[1].n_out_of_order == 1
    assert got[1].max_lateness_us == 15_000_000
    assert got[1].disorder_frac == 0.25
    assert got[2].n_out_of_order == 0 and got[2].max_lateness_us == 0


def test_autocorrelation_detects_period_two(spark):
    from tabsdata_spark.extensions import autocorrelation
    import datetime as dt

    # alternating daily means 0,10,0,10,... -> acf(1) strongly negative,
    # acf(2) strongly positive
    rows = []
    for d in range(14):
        v = 0.0 if d % 2 == 0 else 10.0
        rows.append((d, "k", dt.datetime(2024, 1, 1 + d, 8), v))
    df = spark.createDataFrame(
        rows, "event_id long, k string, ts timestamp, value double")
    got = {r.lag: r for r in
           autocorrelation(df, "k", "ts", "value", max_lag=3).collect()}
    assert got[1].acf < -0.8 and got[2].acf > 0.7
    assert got[1].n_pairs == 13 and got[2].n_pairs == 12


def test_seasonal_adjusted_anomalies_ignores_weekly_cycle(spark):
    from tabsdata_spark.extensions import seasonal_adjusted_anomalies
    import datetime as dt

    # 4 weeks of a strong weekly cycle (weekend=100, weekday=10): pure
    # seasonality -> no anomalies.  Then one corrupted Wednesday.
    rows, rid = [], 0
    for d in range(28):
        day = dt.datetime(2024, 1, 1 + d, 9)
        v = 100.0 if day.weekday() >= 5 else 10.0
        if d == 16:               # a Wednesday spike
            v = 300.0
        rows.append((rid, "k", day, v)); rid += 1
    df = spark.createDataFrame(
        rows, "event_id long, k string, ts timestamp, value double")
    out = seasonal_adjusted_anomalies(df, "k", "ts", "value",
                                      threshold=1.5).collect()
    # the spike is flagged with the largest |z|; a plain weekly cycle
    # never flags a weekend.  (Sibling Wednesdays may co-flag — the
    # spike contaminates its own DOW mean, a documented property of the
    # non-robust profile.)
    assert dt.date(2024, 1, 17) in {r.day for r in out}
    top = max(out, key=lambda r: abs(r.zscore))
    assert top.day == dt.date(2024, 1, 17) and top.zscore > 1.5
    assert all(r.day.weekday() == 2 for r in out)   # only Wednesdays


def test_ewma_exact_weights_and_renormalization(spark):
    from tabsdata_spark import extensions

    rows = [(1, 1, 4.0), (2, 1, 2.0), (3, 1, 1.0)]
    df = spark.createDataFrame(rows, "i long, u long, v double")
    got = {r.i: r.ewma for r in
           extensions.ewma(df, "u", ["i"], "v", alpha=0.5, terms=8).collect()}
    assert got[1] == 4.0                          # head: only itself
    assert got[2] == round((2.0 + 0.5 * 4.0) / 1.5, 6)
    assert got[3] == round((1.0 + 0.5 * 2.0 + 0.25 * 4.0) / 1.75, 6)


def test_max_concurrency_sweep_line(spark):
    import datetime as dt

    from tabsdata_spark import extensions

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)
    # 3 overlapping 30-min sessions around 10:00; 1 isolated at 12:00;
    # one 23:50 session carries into Jan 2 (baseline for day 2)
    rows = [(1, t(10, 0)), (2, t(10, 10)), (3, t(10, 20)),
            (4, t(12, 0)), (5, dt.datetime(2024, 1, 1, 23, 50))]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = {r.day: (r.max_concurrent, r.n_started) for r in
           extensions.max_concurrency(df, "ts", "30 minutes",
                                      id_col="event_id").collect()}
    assert got[dt.datetime(2024, 1, 1)] == (3, 5)
    assert got[dt.datetime(2024, 1, 2)] == (1, 0)   # carried-in baseline only


def test_max_concurrency_half_open_boundary(spark):
    import datetime as dt

    from tabsdata_spark import extensions

    # second session starts exactly when the first ends: never concurrent
    rows = [(1, dt.datetime(2024, 1, 1, 9, 0)),
            (2, dt.datetime(2024, 1, 1, 9, 30))]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = extensions.max_concurrency(df, "ts", "30 minutes",
                                     id_col="event_id").collect()
    assert len(out) == 1 and out[0].max_concurrent == 1


def test_time_to_convert_first_from_next_to(spark):
    import datetime as dt

    from tabsdata_spark import extensions

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [(1, t(0), "view"), (1, t(5), "view"), (1, t(7), "buy"),
            (2, t(3), "buy"), (2, t(4), "view"),   # buy BEFORE first view
            (3, t(0), "view")]                      # never converts
    df = spark.createDataFrame(rows, "u long, ts timestamp, et string")
    got = {r.u: r.latency_seconds for r in
           extensions.time_to_convert(df, "u", "ts", "et",
                                      "view", "buy").collect()}
    assert got == {1: 420.0}   # user 2's buy precedes the view; 3 absent


def test_quantile_normalize_maps_groups_onto_global(spark):
    from tabsdata_spark import extensions

    # group 'a' values 0..9, group 'b' values 100..109: after quantile
    # normalization both map onto the same global reference curve
    rows = ([(i, "a", float(i)) for i in range(10)]
            + [(100 + i, "b", 100.0 + i) for i in range(10)])
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = extensions.quantile_normalize(df, "g", "v", "id").collect()
    by = {}
    for r in out:
        by.setdefault(r.g, []).append((r.v, r.value_norm))
    a = [n for _, n in sorted(by["a"])]
    b = [n for _, n in sorted(by["b"])]
    assert a == b                       # identical normalized curves
    assert a == sorted(a)               # monotone in the original order
    assert a[0] == 0.0 and a[-1] == 109.0   # endpoints hit global min/max


def test_quantile_normalize_single_member_group(spark):
    from tabsdata_spark import extensions

    rows = [(1, "a", 5.0), (2, "a", 7.0), (3, "solo", 100.0)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = {r.id: r.value_norm
           for r in extensions.quantile_normalize(df, "g", "v",
                                                  "id").collect()}
    assert got[3] == 5.0                # p=0 -> global minimum


def test_activity_islands_streaks(spark):
    import datetime as dt

    from tabsdata_spark import extensions

    d = lambda day, h=0: dt.datetime(2024, 1, day, h)
    rows = [(1, d(1)), (1, d(1, 5)), (1, d(2)), (1, d(3)),   # island 1-3
            (1, d(7)),                                        # island 7
            (2, d(10))]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {r.u: (r.n_islands, r.longest_streak, r.total_active_days)
           for r in extensions.activity_islands(df, "u", "ts").collect()}
    assert got[1] == (2, 3, 4)
    assert got[2] == (1, 1, 1)


def test_cohort_ltv_accumulates_per_member(spark):
    import datetime as dt

    from tabsdata_spark import extensions

    w1 = dt.datetime(2024, 1, 1)          # Monday
    w2 = dt.datetime(2024, 1, 8)
    rows = [  # two users first seen week 1; one in week 2
        (1, w1, "purchase", 10.0), (2, w1 + dt.timedelta(days=2), "view", None),
        (1, w2, "purchase", 5.0),          # age 1 for cohort w1
        (3, w2, "purchase", 7.0)]          # cohort w2 age 0
    df = spark.createDataFrame(rows, "u long, ts timestamp, et string, v double")
    out = extensions.cohort_ltv(
        df, "u", "ts", "v", value_filter=F.col("et") == "purchase").collect()
    got = {(r.cohort_week, r.age_weeks):
           (r.n_users, r.revenue, r.cum_ltv_per_user) for r in out}
    assert got[(w1, 0)] == (2, 10.0, 5.0)
    assert got[(w1, 1)] == (2, 5.0, 7.5)       # cumulative 15 over 2 users
    assert got[(w2, 0)] == (1, 7.0, 7.0)


def test_funnel_step_within_caps_each_gap(spark):
    import datetime as dt

    from tabsdata_spark import extensions

    t = lambda h: dt.datetime(2024, 1, 1, h)
    rows = [(1, t(0), "a"), (1, t(1), "b"), (1, t(2), "c"),   # all inside
            (2, t(0), "a"), (2, t(1), "b"), (2, t(9), "c"),   # c too late
            (3, t(0), "a"), (3, t(10), "b")]                   # b too late
    df = spark.createDataFrame(rows, "u long, ts timestamp, et string")
    got = {r.u: r.reached_steps for r in
           extensions.funnel(df, "u", "ts", "et", ["a", "b", "c"],
                             step_within="5 hours").collect()}
    assert got == {1: 3, 2: 2, 3: 1}
    # without the per-step cap all three convert as far as their events go
    base = {r.u: r.reached_steps for r in
            extensions.funnel(df, "u", "ts", "et",
                              ["a", "b", "c"]).collect()}
    assert base == {1: 3, 2: 3, 3: 2}


def test_linear_attribution_exact_split_and_remainder(spark):
    from tabsdata_spark import extensions

    # one purchase of 10.00 with 3 touches: 3.333334 to the earliest
    # (remainder), 3.333333 to the others; credits sum exactly
    rows = [
        (1, "2024-01-10 00:00:00", 7, "click", None),
        (2, "2024-01-10 01:00:00", 7, "view", None),
        (3, "2024-01-10 02:00:00", 7, "click", None),
        (4, "2024-01-10 03:00:00", 7, "purchase", 10.0),
        (5, "2024-01-01 00:00:00", 9, "purchase", 4.0),  # no touches
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
              " value double").withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.touch_type: r for r in extensions.linear_attribution(
        df, "user_id", "ts", "event_type", "value",
        "purchase", ["click", "view"], "7 days").collect()}
    assert out["click"].n_credits == 2
    assert out["view"].n_credits == 1
    total_credited = out["click"].revenue + out["view"].revenue
    assert abs(total_credited - 10.0) < 1e-9
    # earliest touch (event 1, a click) carries the remainder micro
    assert out["click"].revenue > out["view"].revenue * 2
    assert out["direct"].n_credits == 1
    assert abs(out["direct"].revenue - 4.0) < 1e-9


def test_holt_linear_constant_and_trend_series(spark):
    from tabsdata_spark import extensions

    const = spark.createDataFrame(
        [("a", i, 10) for i in range(6)], "k string, t int, y long")
    out = extensions.holt_linear(const, "k", "t", "y").orderBy("t").collect()
    assert all(r.level == 10.0 and r.trend == 0.0 for r in out)

    # exact linear ramp y = 5 + 3t converges toward trend 3
    ramp = spark.createDataFrame(
        [("a", i, 5 + 3 * i) for i in range(30)], "k string, t int, y long")
    last = extensions.holt_linear(ramp, "k", "t", "y").orderBy("t").collect()[-1]
    assert abs(last.trend - 3.0) < 0.1
    assert abs(last.forecast_next - (5 + 3 * 30)) < 0.5


def test_holt_linear_matches_python_reference(spark):
    import math

    from tabsdata_spark import extensions

    ys = [4, 9, 2, 15, 7, 7, 11, 0, 3, 20]
    df = spark.createDataFrame(
        [("s", i, y) for i, y in enumerate(ys)], "k string, t int, y long")
    got = [(r.level, r.trend) for r in
           extensions.holt_linear(df, "k", "t", "y").orderBy("t").collect()]
    l = ys[0] * 1_000_000
    b = 0
    want = [(l / 1e6, 0.0)]
    for y in ys[1:]:
        ln = math.floor((y * 1_000_000 + l + b) / 2.0)
        b = math.floor(((ln - l) + b) / 2.0)
        l = ln
        want.append((l / 1e6, b / 1e6))
    assert got == want


def test_position_attribution_exact_u_shape(spark):
    from tabsdata_spark import extensions

    # 4 touches then a 10.00 purchase: ends get (vm*2) div 5 = 4.0 each,
    # middles split 2.0 -> 1.0 each; credits balance exactly
    rows = [
        (1, "2024-01-10 00:00:00", 7, "click", None),
        (2, "2024-01-10 01:00:00", 7, "view", None),
        (3, "2024-01-10 02:00:00", 7, "view", None),
        (4, "2024-01-10 03:00:00", 7, "click", None),
        (5, "2024-01-10 04:00:00", 7, "purchase", 10.0),
        (6, "2024-01-01 00:00:00", 9, "purchase", 4.0),  # direct
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
              " value double").withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.touch_type: r for r in extensions.position_attribution(
        df, "user_id", "ts", "event_type", "value",
        "purchase", ["click", "view"], "7 days").collect()}
    # clicks are positions 1 and 4 (ends): 4.0 + 4.0; views middles: 1+1
    assert abs(out["click"].revenue - 8.0) < 1e-9
    assert abs(out["view"].revenue - 2.0) < 1e-9
    assert out["direct"].n_credits == 1
    assert abs(out["direct"].revenue - 4.0) < 1e-9


def test_position_attribution_small_n_and_remainder(spark):
    from tabsdata_spark import extensions

    # n=1: everything to the single touch. n=3 with vm=10000001 micros:
    # ends 4000000 each, middle pool 2000001 entirely to position 2
    rows = [
        (1, "2024-01-10 00:00:00", 1, "click", None),
        (2, "2024-01-10 01:00:00", 1, "purchase", 5.0),
        (3, "2024-01-11 00:00:00", 2, "click", None),
        (4, "2024-01-11 01:00:00", 2, "view", None),
        (5, "2024-01-11 02:00:00", 2, "click", None),
        (6, "2024-01-11 03:00:00", 2, "purchase", 10.000001),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
              " value double").withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.touch_type: r for r in extensions.position_attribution(
        df, "user_id", "ts", "event_type", "value",
        "purchase", ["click", "view"], "7 days").collect()}
    total = out["click"].revenue + out["view"].revenue
    assert abs(total - (5.0 + 10.000001)) < 1e-9
    # user 2: clicks are both ends (8.0), view carries pool 2.000001
    assert abs(out["view"].revenue - 2.000001) < 1e-9


def test_holt_winters_matches_python_reference(spark):
    import math

    from tabsdata_spark import extensions

    ys = [10, 14, 6, 11, 15, 7, 12, 16, 8, 13, 17, 9]
    df = spark.createDataFrame(
        [("s", i, y) for i, y in enumerate(ys)], "k string, t int, y long")
    got = [(r.level, r.trend, r.seasonal, r.forecast_next) for r in
           extensions.holt_winters(df, "k", "t", "y", period=3)
           .orderBy("t").collect()]
    sl = [0, 0, 0]
    l = b = 0
    want = []
    for i, y in enumerate(ys):
        ym = y * 1_000_000
        su = sl[0]
        if i == 0:
            l, b, sn = ym, 0, 0
        else:
            ln = math.floor((ym - su + l + b) / 2.0)
            b = math.floor(((ln - l) + b) / 2.0)
            sn = math.floor(((ym - ln) + su) / 2.0)
            l = ln
        sl = sl[1:] + [sn]
        want.append((l / 1e6, b / 1e6, sn / 1e6, (l + b + sl[0]) / 1e6))
    assert got == want


def test_holt_winters_learns_pure_seasonality(spark):
    from tabsdata_spark import extensions

    # exact period-2 alternation 10,20,10,20...: after convergence the
    # forecast tracks the alternation direction
    ys = [10, 20] * 12
    df = spark.createDataFrame(
        [("s", i, y) for i, y in enumerate(ys)], "k string, t int, y long")
    rows = (extensions.holt_winters(df, "k", "t", "y", period=2)
            .orderBy("t").collect())
    last = rows[-1]       # last observed value is 20; next is 10
    prev = rows[-2]
    assert last.forecast_next < prev.forecast_next


def test_time_decay_attribution_exact_weights(spark):
    from tabsdata_spark import extensions

    # touches 0 and 2 days before a 9.00 purchase: weights 64 and 16,
    # credits 9e6*64//80=7200000 and 9e6*16//80=1800000 micros (exact)
    rows = [
        (1, "2024-01-08 00:00:00", 7, "click", None),
        (2, "2024-01-10 00:00:00", 7, "view", None),
        (3, "2024-01-10 00:30:00", 7, "purchase", 9.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
              " value double").withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.touch_type: r for r in extensions.time_decay_attribution(
        df, "user_id", "ts", "event_type", "value",
        "purchase", ["click", "view"], "7 days", "1 day").collect()}
    assert abs(out["view"].revenue - 7.2) < 1e-9
    assert abs(out["click"].revenue - 1.8) < 1e-9
    assert out["direct"].n_credits == 0


def test_abc_analysis_classes_and_shares(spark):
    from tabsdata_spark import extensions

    # one group: revenues 50, 30, 15, 5 -> cum shares .5 / .8 / .95 / 1.0
    rows = [("g", 1, 50.0), ("g", 2, 30.0), ("g", 3, 15.0), ("g", 4, 5.0)]
    df = spark.createDataFrame(rows, "grp string, k int, v double")
    out = {r.abc_class: r for r in extensions.abc_analysis(
        df, "grp", "k", "v").collect()}
    assert out["A"].n_keys == 1 and out["A"].revenue == 50.0
    assert out["B"].n_keys == 1 and out["B"].revenue == 30.0
    assert out["C"].n_keys == 2 and out["C"].revenue == 20.0
    assert out["A"].revenue_share == 0.5


def test_resample_interpolate_exact_midpoints(spark):
    from tabsdata_spark import extensions

    # observed at buckets 0 (v=10) and 3 (v=16): gaps 1, 2 interpolate
    # to exactly 12 and 14; trailing point 5 has no bracket -> absent 4
    rows = [("k", 0, 10.0), ("k", 3, 16.0), ("k", 5, 99.0)]
    df = spark.createDataFrame(rows, "k string, b long, v double")
    out = {r.b: r for r in extensions.resample_interpolate(
        df, "k", "b", "v").collect()}
    assert set(out) == {0, 1, 2, 3, 4, 5}
    assert out[0].v == 10.0 and not out[0].interpolated
    assert out[1].v == 12.0 and out[1].interpolated
    assert out[2].v == 14.0
    assert out[3].v == 16.0 and not out[3].interpolated
    # gap 4 between 3 and 5 interpolates (16 + 99)/... linearly
    assert out[4].v == (16.0 + 99.0) / 2
    assert out[5].v == 99.0


def test_markov_entropy_deterministic_chain_is_zero(spark):
    from tabsdata_spark.extensions import markov_entropy
    from datetime import datetime

    # a -> b -> a -> b: every state has exactly one successor -> H = 0
    rows = [(1, datetime(2024, 1, 1, 0, 0, i), "a" if i % 2 == 0 else "b")
            for i in range(8)]
    df = spark.createDataFrame(rows, "u long, ts timestamp, s string")
    got = {r.state: r for r in
           markov_entropy(df, "u", "ts", "s").collect()}
    assert got["a"].h_bits == 0.0 and got["b"].h_bits == 0.0
    assert got["a"].rate_contrib == 0.0


def test_markov_entropy_uniform_two_way_is_one_bit(spark):
    from tabsdata_spark.extensions import markov_entropy
    from datetime import datetime

    # from 'a' go to b,c equally often -> H(a) = 1 bit
    seq = ["a", "b", "a", "c", "a", "b", "a", "c", "a"]
    rows = [(1, datetime(2024, 1, 1, 0, 0, i), s)
            for i, s in enumerate(seq)]
    df = spark.createDataFrame(rows, "u long, ts timestamp, s string")
    got = {r.state: r for r in
           markov_entropy(df, "u", "ts", "s").collect()}
    assert got["a"].h_bits == 1.0
    assert got["a"].n_a == 4


def test_growth_accounting_decomposition(spark):
    from tabsdata_spark.extensions import growth_accounting
    from datetime import datetime

    # weeks are epoch-day div 7; pick aligned dates
    def at(day):
        return datetime(1970, 1, 1 + day)

    rows = [
        (1, at(0)), (1, at(7)),            # u1: w0, w1 (retained)
        (2, at(0)),                        # u2: w0 only (churns at w1)
        (3, at(0)), (3, at(14)),           # u3: w0, gone w1, back w2
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {r.week: r for r in
           growth_accounting(df, "u", "ts").collect()}
    w0, w1, w2 = got[0], got[1], got[2]
    assert (w0.active, w0.new_users, w0.retained, w0.resurrected,
            w0.churned) == (3, 3, 0, 0, 0)
    # churned at w1 = u2 (gone for good) + u3 (gap-churn, resurrects at w2)
    assert (w1.active, w1.new_users, w1.retained, w1.churned) \
        == (1, 0, 1, 2)
    assert (w2.active, w2.resurrected) == (1, 1)
    # active always equals new + retained + resurrected
    for r in got.values():
        assert r.active == r.new_users + r.retained + r.resurrected


def test_cusum_closed_form_matches_recursion(spark):
    from tabsdata_spark.extensions import cusum

    xs = [100, 300, 250, 50, 400, 120]  # micros
    k, h = 200, 300
    df = spark.createDataFrame(list(enumerate(xs)), "t long, xq long")
    got = {r.t: (r.cusum, r.breach)
           for r in cusum(df, "t", "xq", k, h).collect()}
    s = 0
    for t, x in enumerate(xs):
        s = max(0, s + x - k)
        assert got[t] == (round(s / 1e6, 6), s >= h)


def test_bounce_rate_hand_case(spark):
    from tabsdata_spark.extensions import bounce_rate
    from datetime import datetime

    rows = [
        (1, 1, datetime(2024, 1, 1, 10, 0, 0)),   # session A (2 events)
        (1, 2, datetime(2024, 1, 1, 10, 10, 0)),
        (1, 3, datetime(2024, 1, 1, 12, 0, 0)),   # session B (bounce)
        (2, 4, datetime(2024, 1, 1, 9, 0, 0)),    # session C (bounce)
    ]
    df = spark.createDataFrame(rows, "u long, eid long, ts timestamp")
    r = bounce_rate(df, "u", "ts", tie_cols=["eid"]).collect()[0]
    assert (r.n_sessions, r.n_bounces) == (3, 2)
    assert r.bounce_rate == round(2 / 3, 6)


def test_numeric_near_dup_bands_find_all_pairs_once(spark):
    from tabsdata_spark.extensions import numeric_near_dup

    # values straddle band boundaries: (100,199) diff 99 crosses bands
    rows = [("k", 1, 100), ("k", 2, 199), ("k", 3, 301), ("k", 4, 150),
            ("z", 5, 100), ("z", 6, 500)]
    df = spark.createDataFrame(rows, "g string, id long, c long")
    out = numeric_near_dup(df, "g", "id", "c", tolerance=100)
    got = sorted((r.id_a, r.id_b, r.diff_cents) for r in out.collect())
    assert got == [(1, 2, 99), (1, 4, 50), (2, 4, 49)]


def test_mase_backtest_perfect_seasonality(spark):
    from tabsdata_spark.extensions import mase_backtest

    # exact period-7 series: seasonal error 0 -> mase = 0
    ys = [10, 20, 30, 40, 50, 60, 70] * 3
    df = spark.createDataFrame(list(enumerate(ys)), "t long, y long")
    r = mase_backtest(df, "t", "y", season=7).collect()[0]
    assert (r.n_points, r.seasonal_abs_err) == (14, 0)
    assert r.mase == 0.0
    # flat series: naive error 0 -> NULL
    flat = spark.createDataFrame([(i, 5) for i in range(15)],
                                 "t long, y long")
    assert mase_backtest(flat, "t", "y").collect()[0].mase is None


def test_dwell_time_attributes_to_current_state(spark):
    from tabsdata_spark.extensions import dwell_time
    from datetime import datetime

    t0 = datetime(2024, 1, 1, 10, 0, 0)

    def at(sec):
        return datetime(2024, 1, 1, 10, 0, 0).replace(second=0) \
            if sec is None else t0.replace(minute=sec // 60,
                                           second=sec % 60)

    rows = [
        (1, 1, at(0), "view"),     # dwell 60s on view
        (1, 2, at(60), "click"),   # dwell 30s on click
        (1, 3, at(90), "buy"),     # session end: no dwell
        (2, 4, at(0), "view"),     # next event 1h later: gap > session
        (2, 5, at(0).replace(hour=12), "buy"),
    ]
    df = spark.createDataFrame(rows, "u long, eid long, ts timestamp,"
                                     " et string")
    got = {r.state: (r.n_dwells, r.mean_dwell_sec) for r in
           dwell_time(df, "u", "ts", "et", tie_cols=["eid"]).collect()}
    assert got["view"] == (1, 60.0)
    assert got["click"] == (1, 30.0)
    assert "buy" not in got


def test_rolling_distinct_trailing_window(spark):
    from tabsdata_spark.extensions import rolling_distinct
    from datetime import datetime

    def at(day):
        return datetime(1970, 1, 1 + day)

    rows = [(1, at(0)), (2, at(0)), (1, at(3)), (3, at(8))]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {r.day: (r.dau, r.trailing_actives) for r in
           rolling_distinct(df, "u", "ts", window_days=7).collect()}
    assert got[0] == (2, 2)           # day0: users 1,2
    assert got[3] == (1, 2)           # trailing7 at day3 = {1,2}
    # day8: user 3 today; user 1 (day3) still inside [2..8]
    assert got[8] == (1, 2)


def test_skyline2d_frontier_and_tie_counts(spark):
    from tabsdata_spark.extensions import skyline2d

    # (1,5) frontier; (2,3) frontier; (2,9) dominated by (2,3);
    # (3,3) dominated by (2,3); (4,1) frontier; duplicate (4,1)
    pts = [(1, 5), (2, 3), (2, 9), (3, 3), (4, 1), (4, 1)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r.x, r.y): r.n_points for r in skyline2d(df, "x", "y").collect()}
    assert got == {(1, 5): 1, (2, 3): 1, (4, 1): 2}


def test_tenure_hazard_censoring_and_at_risk(spark):
    from tabsdata_spark.extensions import tenure_hazard
    from datetime import datetime

    def at(week):
        return datetime(1970, 1, 1 + 7 * week)

    rows = [
        (1, at(0)), (1, at(1)),          # tenure 1, churns (lw=1 < mw)
        (2, at(0)),                      # tenure 0, churns
        (3, at(0)), (3, at(3)),          # tenure 3, lw = max -> censored
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {r.tenure_weeks: r for r in
           tenure_hazard(df, "u", "ts").collect()}
    assert (got[0].at_risk, got[0].churned) == (3, 1)
    assert (got[1].at_risk, got[1].churned) == (2, 1)
    assert (got[3].at_risk, got[3].churned) == (1, 0)  # censored
    assert got[3].hazard == 0.0


def test_contribution_tree_shares_sum_to_one(spark):
    from tabsdata_spark.extensions import contribution_tree

    rows = [("r1", "n1", 10.0), ("r1", "n2", 30.0), ("r2", "n3", 60.0)]
    df = spark.createDataFrame(rows, "p string, c string, v double")
    got = {(r.parent, r.child): r for r in
           contribution_tree(df, "p", "c", "v").collect()}
    assert got[("r1", "n1")].share_of_parent == 0.25
    assert got[("r1", "n2")].share_of_parent == 0.75
    assert got[("r2", "n3")].share_of_parent == 1.0
    assert sum(r.share_of_total for r in got.values()) == 1.0


def test_daily_percentile_bands_exact(spark):
    from tabsdata_spark.extensions import daily_percentile_bands
    from datetime import datetime

    rows = [(datetime(2024, 1, 1, 0, 0, i), v)
            for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 10])]
    df = spark.createDataFrame(rows, "ts timestamp, v long")
    r = daily_percentile_bands(df, "ts", "v").collect()[0]
    assert (r.n, r.p10, r.p50, r.p90) == (10, 1, 5, 9)


def test_freshness_report_lag_and_last_hour(spark):
    from tabsdata_spark.extensions import freshness_report
    from datetime import datetime

    rows = [
        ("live", datetime(2024, 1, 1, 12, 0, 0)),
        ("live", datetime(2024, 1, 1, 11, 30, 0)),
        ("stale", datetime(2024, 1, 1, 9, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    got = {r.g: r for r in freshness_report(df, "g", "ts").collect()}
    assert got["live"].lag_seconds == 0
    assert got["live"].n_last_hour == 2
    assert got["stale"].lag_seconds == 3 * 3600
    assert got["stale"].n_last_hour == 0


def test_growth_accounting_zero_active_interior_week(spark):
    """An interior week with ZERO actives still surfaces its churn row
    (r5 advice finding: the old left join dropped it); the week past
    the last observed activity week stays unemitted."""
    from datetime import datetime

    from tabsdata_spark.extensions import growth_accounting

    def at(day):
        return datetime(1970, 1, 1 + day)

    # u1,u2 active w0; nobody active w1; u1 back w2
    rows = [(1, at(0)), (2, at(0)), (1, at(14))]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {r.week: r for r in growth_accounting(df, "u", "ts").collect()}
    assert set(got) == {0, 1, 2}
    w1 = got[1]
    assert (w1.active, w1.new_users, w1.retained, w1.resurrected,
            w1.churned) == (0, 0, 0, 0, 2)
    w2 = got[2]
    assert (w2.active, w2.resurrected, w2.churned) == (1, 1, 0)
    # week 3 (past the last observed activity week) is not emitted,
    # even though u2's final churn would land there
    assert 3 not in got


def test_growth_accounting_conservation(spark):
    """Decomposition invariants on synthetic data: active = new +
    retained + resurrected each week, and total new across weeks =
    number of distinct users."""
    from datetime import datetime, timedelta

    from tabsdata_spark.extensions import growth_accounting

    base = datetime(2024, 1, 1)
    rows = []
    for u in range(30):
        for w in range(5):
            if (u * 7 + w * 3) % 4 != 0:
                rows.append((u, base + timedelta(days=7 * w + u % 7)))
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    out = growth_accounting(df, "u", "ts").collect()
    for r in out:
        assert r.active == r.new_users + r.retained + r.resurrected
    n_users = len({u for u, _ in rows})
    assert sum(r.new_users for r in out) == n_users
