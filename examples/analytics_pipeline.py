"""Event-analytics pipeline example: the clickstream-shaped composition.

events -> per-user sessionization-grade orderings -> conversion funnel ->
weekly retention cohorts -> first-order Markov transition matrix ->
trailing-window anomaly flags -> winsorized value distribution -> A/B
t-test between user cohorts -> versioned store.

Every stage is a DataFrame transform built from the extension/stats
operators: funnels are k-1 user-keyed min-joins (no full-table windows),
retention is two partial-agg shuffles, transitions are one lead() window,
anomalies are per-key integer-moment rolling windows, and the t-test is
six conditional sums in a single aggregation.  At 100 TB the only wide
operations are key-partitioned shuffles.

Run:  python examples/analytics_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

import tabsdata_spark as td
from tabsdata_spark import stats
from tabsdata_spark.extensions import (cooccurrence_lift, funnel,
                                       markov_transitions, resample_ffill,
                                       retention_cohorts, rolling_zscore)
from tabsdata_spark.queries import load_events
from tabsdata_spark.store.table_store import TableStore

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = td.get_spark(app_name="analytics-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_events(spark, SF_DIR).df
    n0 = ev.count()

    # 1. conversion funnel: signup -> view -> purchase within 2 days
    fun = funnel(ev, "user_id", "ts", "event_type",
                 ["signup", "view", "purchase"], within="2 DAY")
    steps = {r.reached_steps: r.n for r in
             fun.groupBy("reached_steps")
             .agg(F.count(F.lit(1)).alias("n")).collect()}

    # 2. weekly retention cohorts
    ret = retention_cohorts(ev, "user_id", "ts", granularity="week")
    n_cohorts = ret.select("cohort").distinct().count()

    # 3. Markov transition matrix between event types
    trans = markov_transitions(ev, "user_id", "ts", "event_type",
                               tie_cols=["event_id"])

    # 4. trailing-window anomalies on the value stream
    anom = rolling_zscore(ev, "user_id", "ts", "value",
                          window=20, min_periods=8, threshold=2.5,
                          tie_cols=["event_id"])
    n_anom = anom.count()

    # 5. winsorize the value column per event type ([p01, p99])
    wins = stats.winsorize(ev, "value", ["event_type"])
    n_clipped = wins.filter(F.col("value_w") != F.col("value")).count()

    # 6. A/B test: even vs odd user ids
    ab = stats.welch_ttest(
        ev.withColumn("cohort", F.col("user_id") % 2 == 0),
        "value", "cohort", ["event_type"])

    # 7. co-occurrence lift between event types across user baskets
    lift = cooccurrence_lift(ev, "user_id", "event_type")

    # 8. hourly gap-filled per-user value series (sampled users)
    filled = resample_ffill(
        ev.filter(F.col("user_id") % 50 == 0)
        .select("user_id", "ts", "value"),
        "user_id", "ts", "value")

    # 9. time-series diagnostics: where did the metric level shift, is
    #    there weekly memory, and which days break their DOW profile?
    from tabsdata_spark.extensions import (autocorrelation,
                                           changepoint_detect,
                                           seasonal_adjusted_anomalies)
    shift = changepoint_detect(ev, "event_type", "ts", "value")
    acf = autocorrelation(ev, "event_type", "ts", "value", max_lag=7)
    season = seasonal_adjusted_anomalies(ev, "event_type", "ts", "value")

    # publish the derived tables to a versioned store
    work = tempfile.mkdtemp(prefix="tdspark_analytics_")
    store = TableStore(os.path.join(work, "warehouse"))
    for name, df in [("funnel", fun), ("retention", ret),
                     ("transitions", trans), ("anomalies", anom),
                     ("ab_test", ab), ("lift", lift),
                     ("value_series", filled), ("level_shifts", shift),
                     ("acf", acf), ("seasonal_anomalies", season)]:
        store.write(df, "analytics", name)

    print(f"events:            {n0}")
    print(f"funnel reach:      {dict(sorted(steps.items()))}")
    print(f"cohorts:           {n_cohorts}")
    print(f"transitions:       {trans.count()} pairs")
    print(f"anomalies flagged: {n_anom}")
    print(f"values winsorized: {n_clipped}")
    print(f"ab rows:           {ab.count()}")
    print(f"lift pairs:        {lift.count()}")
    print(f"series points:     {filled.count()}")
    print(f"level shifts:      {shift.count()} (one per event_type)")
    print(f"acf rows:          {acf.count()}")
    print(f"seasonal flags:    {season.count()}")
    print(f"store:             {store.root}")
    back = store.read(spark, "analytics", "transitions")
    print(f"replayed:          {back.df.count()} transition rows from the store")


if __name__ == "__main__":
    main()
