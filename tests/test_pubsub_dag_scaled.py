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
