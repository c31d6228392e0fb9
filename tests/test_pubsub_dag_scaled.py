"""Scaled pub/sub integration (r8 verdict item 6): a four-function DAG at
sf0.1 — publisher (FUNCTION-offset watermark source over orders.parquet,
150k rows) -> daily_revenue transformer -> self-dependent revenue_accum
(HEAD dep) -> parquet subscriber — triggered twice so every hardened unit
from the r8 edge sweep (offset restore, FUNCTION-mode offsets, version
refs, merge-by-concat accumulation) is exercised composed, not just in
isolation.  Asserts the full version lineage and cross-checks the final
accumulated revenue against a direct Spark aggregation over the same
parquet.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import tabsdata_spark as td
from tabsdata_spark.pubsub import PubSubEngine
from tabsdata_spark.store.table_store import TableStore

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SCALED", "/root/testdata/sf0.1")
# the synthetic orders span 1995-01-01 .. 2001-08-01: this cutoff puts a
# real slice on each side of the two runs
CUTOFF = "1998-01-01"


@pytest.mark.skipif(not os.path.exists(f"{SF_DIR}/orders.parquet"),
                    reason="sf0.1 testdata not present")
def test_multi_function_dag_at_sf01(spark, tmp_path):
    store = TableStore(str(tmp_path / "wh"))
    engine = PubSubEngine(spark, store)
    out_dir = tmp_path / "export"

    class OrdersFeed(td.SourcePlugin):
        """Watermark source over the orders table: each run publishes the
        [from, to) date slice, and the FUNCTION offset return advances the
        window — run 2 must see run 1's persisted offsets restored."""

        offset_return = "function"

        def __init__(self):
            super().__init__()
            self.initial_values = {"from": "1000-01-01", "to": CUTOFF}

        def chunk(self, spark_, working_dir):
            lo, hi = self.initial_values["from"], self.initial_values["to"]
            return (spark_.read.parquet(f"{SF_DIR}/orders.parquet")
                    .where(F.col("o_orderdate") >= lo)
                    .where(F.col("o_orderdate") < hi))

    @td.publisher(OrdersFeed(), tables="orders_raw")
    def ingest(tf):
        nxt = {"from": ingest.source.initial_values["to"], "to": "9999-12-31"}
        return tf, nxt

    @td.transformer(input_tables=["orders_raw"],
                    output_tables=["daily_revenue"])
    def daily(tf):
        return (tf.group_by("o_orderdate")
                .agg(revenue=td.col("o_totalprice").sum(),
                     n_orders=td.col("o_orderkey").count()))

    @td.transformer(input_tables=["daily_revenue", "revenue_accum@HEAD"],
                    output_tables=["revenue_accum"],
                    trigger_by=["daily_revenue"])
    def accumulate(delta, prev):
        if prev is None:
            return delta
        both = td.concat([prev, delta], how="vertical_relaxed")
        return (both.group_by("o_orderdate")
                .agg(revenue=td.col("revenue").sum(),
                     n_orders=td.col("n_orders").sum()))

    @td.subscriber(tables=["revenue_accum"],
                   destination=td.LocalFileDestination(
                       str(out_dir), format="parquet"))
    def export(tf):
        return tf

    for fn in (ingest, daily, accumulate, export):
        engine.register("scaled", fn)

    # ---- run 1: orders strictly before the cutoff ----------------------
    r1 = engine.trigger("scaled", "ingest")
    assert [x.status for x in r1] == ["committed"] * 4, \
        [(x.function, x.error) for x in r1]
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_before = orders.where(F.col("o_orderdate") < CUTOFF).count()
    assert 0 < n_before < orders.count(), \
        "cutoff must split the data into two non-empty slices"
    assert store.read(spark, "scaled", "orders_raw").to_spark() \
        .count() == n_before

    # ---- run 2: the rest (offsets restored from run 1) -----------------
    r2 = engine.trigger("scaled", "ingest")
    assert [x.status for x in r2] == ["committed"] * 4, \
        [(x.function, x.error) for x in r2]

    # version lineage: every table has exactly 2 committed versions, and
    # HEAD~1 still reads run 1's output
    meta = store.meta
    lineage = {}
    for t in ("orders_raw", "daily_revenue", "revenue_accum"):
        vers = meta.version_rows("scaled", t)
        assert len(vers) == 2, (t, vers)
        lineage[t] = [(v["id"], v["row_count"]) for v in vers]
    assert store.read(spark, "scaled", "orders_raw", "HEAD~1").to_spark() \
        .count() == n_before
    n_total = orders.count()
    assert store.read(spark, "scaled", "orders_raw", "HEAD~1..HEAD") \
        .to_spark().count() == n_total

    # the accumulated table equals a direct one-shot aggregation
    acc = store.read(spark, "scaled", "revenue_accum").to_spark()
    direct = (orders.groupBy("o_orderdate")
              .agg(F.sum("o_totalprice").alias("revenue"),
                   F.count("o_orderkey").alias("n_orders")))
    assert acc.count() == direct.count()
    got = acc.agg(F.sum("revenue"), F.sum("n_orders")).collect()[0]
    want = direct.agg(F.sum("revenue"), F.sum("n_orders")).collect()[0]
    assert got[1] == want[1] == n_total
    assert abs(got[0] - want[0]) <= abs(want[0]) * 1e-9

    # the subscriber exported run 2's accumulated snapshot
    exported = spark.read.parquet(str(out_dir)).count()
    assert exported == acc.count()

    # run-2 delta really was incremental: daily_revenue@HEAD covers only
    # post-cutoff dates
    d2 = store.read(spark, "scaled", "daily_revenue").to_spark()
    assert d2.where(F.col("o_orderdate") < CUTOFF).count() == 0

    print("LINEAGE", {t: v for t, v in lineage.items()},
          "rows", {"orders_raw": n_total, "daily_revenue_head": d2.count(),
                   "revenue_accum": acc.count(), "exported": exported})


@pytest.mark.skipif(not os.path.exists(f"{SF_DIR}/orders.parquet"),
                    reason="sf0.1 testdata not present")
def test_diamond_dag_at_sf01(spark, tmp_path):
    """Diamond trigger graph at sf0.1 (r9 verdict item 6): one publisher
    fanning out to TWO transformers whose outputs a third transformer
    joins, with a HEAD~1 dep on one branch — the trigger-graph shape the
    reference's graphs.rs:37-158 orders via dep_pos.  The join function
    must run exactly ONCE per cascade (it is triggered by both branch
    tables, published in the same wave) and strictly after both branches;
    its branch_a@HEAD~1 input must be None on run 1 and run 1's version
    on run 2 (refs resolve as-of the trigger, before this run writes)."""
    store = TableStore(str(tmp_path / "wh"))
    engine = PubSubEngine(spark, store)
    out_dir = tmp_path / "export"

    class OrdersFeed(td.SourcePlugin):
        offset_return = "function"

        def __init__(self):
            super().__init__()
            self.initial_values = {"from": "1000-01-01", "to": CUTOFF}

        def chunk(self, spark_, working_dir):
            lo, hi = self.initial_values["from"], self.initial_values["to"]
            return (spark_.read.parquet(f"{SF_DIR}/orders.parquet")
                    .where(F.col("o_orderdate") >= lo)
                    .where(F.col("o_orderdate") < hi))

    @td.publisher(OrdersFeed(), tables="orders_raw")
    def ingest(tf):
        nxt = {"from": ingest.source.initial_values["to"], "to": "9999-12-31"}
        return tf, nxt

    @td.transformer(input_tables=["orders_raw"], output_tables=["branch_a"])
    def rev_by_priority(tf):
        return (tf.group_by("o_orderpriority")
                .agg(revenue=td.col("o_totalprice").sum()))

    @td.transformer(input_tables=["orders_raw"], output_tables=["branch_b"])
    def cnt_by_priority(tf):
        return (tf.group_by("o_orderpriority")
                .agg(n_orders=td.col("o_orderkey").count()))

    @td.transformer(input_tables=["branch_a", "branch_b", "branch_a@HEAD~1"],
                    output_tables=["joined"],
                    trigger_by=["branch_a", "branch_b"])
    def join_branches(a, b, prev_a):
        out = a.join(b, on="o_orderpriority", how="inner")
        if prev_a is None:
            return out.with_columns(
                delta=td.col("revenue"),
                had_prev=td.lit(False))
        prev = prev_a.rename({"revenue": "prev_revenue"})
        return (out.join(prev, on="o_orderpriority", how="left")
                .with_columns(
                    delta=td.col("revenue")
                    - td.col("prev_revenue").fill_null(0.0),
                    had_prev=td.col("prev_revenue").is_not_null())
                .drop("prev_revenue"))

    @td.subscriber(tables=["joined"],
                   destination=td.LocalFileDestination(
                       str(out_dir), format="parquet"))
    def export(tf):
        return tf

    for fn in (ingest, rev_by_priority, cnt_by_priority, join_branches,
               export):
        engine.register("diamond", fn)

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    pre = orders.where(F.col("o_orderdate") < CUTOFF)
    post = orders.where(F.col("o_orderdate") >= CUTOFF)

    def assert_cascade(reports):
        assert [x.status for x in reports] == ["committed"] * 5, \
            [(x.function, x.error) for x in reports]
        names = [x.function.rsplit("/", 1)[-1] for x in reports]
        # the join ran exactly once, after BOTH branches; export last
        assert names[0] == "ingest"
        assert set(names[1:3]) == {"rev_by_priority", "cnt_by_priority"}
        assert names[3:] == ["join_branches", "export"]

    # ---- run 1 ---------------------------------------------------------
    assert_cascade(engine.trigger("diamond", "ingest"))
    j1 = store.read(spark, "diamond", "joined").to_spark().collect()
    want1 = {r["o_orderpriority"]: (r["rev"], r["n"]) for r in
             pre.groupBy("o_orderpriority")
             .agg(F.sum("o_totalprice").alias("rev"),
                  F.count("o_orderkey").alias("n")).collect()}
    assert len(j1) == len(want1)
    for r in j1:
        wrev, wn = want1[r["o_orderpriority"]]
        assert r["n_orders"] == wn
        assert abs(r["revenue"] - wrev) <= abs(wrev) * 1e-9
        # run 1: branch_a@HEAD~1 resolved to None
        assert r["had_prev"] is False
        assert r["delta"] == r["revenue"]

    # ---- run 2 ---------------------------------------------------------
    assert_cascade(engine.trigger("diamond", "ingest"))
    j2 = store.read(spark, "diamond", "joined").to_spark().collect()
    want2 = {r["o_orderpriority"]: (r["rev"], r["n"]) for r in
             post.groupBy("o_orderpriority")
             .agg(F.sum("o_totalprice").alias("rev"),
                  F.count("o_orderkey").alias("n")).collect()}
    assert len(j2) == len(want2)
    for r in j2:
        wrev, wn = want2[r["o_orderpriority"]]
        assert r["n_orders"] == wn
        assert abs(r["revenue"] - wrev) <= abs(wrev) * 1e-9
        # run 2: HEAD~1 is run 1's branch_a — every priority overlaps
        assert r["had_prev"] is True
        wprev, _ = want1[r["o_orderpriority"]]
        assert abs(r["delta"] - (wrev - wprev)) <= abs(wrev) * 1e-9

    # lineage: every diamond table has exactly 2 committed versions
    for t in ("orders_raw", "branch_a", "branch_b", "joined"):
        assert len(store.meta.version_rows("diamond", t)) == 2, t
    # HEAD~1 of the joined table still reads run 1's output
    assert (store.read(spark, "diamond", "joined", "HEAD~1").to_spark()
            .count()) == len(j1)
    # the subscriber exported run 2's snapshot
    assert spark.read.parquet(str(out_dir)).count() == len(j2)

    print("DIAMOND LINEAGE",
          {t: [(v["id"], v["row_count"]) for v in
               store.meta.version_rows("diamond", t)]
           for t in ("orders_raw", "branch_a", "branch_b", "joined")})
