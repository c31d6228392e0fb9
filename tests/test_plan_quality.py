"""Plan-quality regression tests: the wrapper must not defeat Catalyst.

These assert on the *physical plan*, not results: filters and projections
must reach the Parquet scan through the TableFrame/system-column layer, and
dimension joins must broadcast.  If a wrapper change breaks one of these,
correctness tests stay green while 100 TB behavior regresses — this is the
canary.
"""

from __future__ import annotations

import pyspark.sql.functions as F

import tabsdata_spark as td


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = td.TableFrame.from_spark(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    out = li.filter(td.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = _plan(out.df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = td.TableFrame.from_spark(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    out = li.select("l_orderkey", "l_quantity")
    plan = _plan(out.df)
    # ReadSchema must contain only the two referenced columns
    rs = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_orderkey" in rs and "l_quantity" in rs
    assert "l_extendedprice" not in rs and "l_shipdate" not in rs


def test_dimension_join_broadcasts(spark, sf_dir):
    li = td.TableFrame.from_spark(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    pt = td.TableFrame.from_spark(spark.read.parquet(f"{sf_dir}/part.parquet"))
    j = li.join(pt, left_on="l_partkey", right_on="p_partkey")
    assert "BroadcastHashJoin" in _plan(j.df)


def test_aggregation_is_partial_final(spark, sf_dir):
    li = td.TableFrame.from_spark(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    out = li.group_by("l_returnflag").agg(s=td.col("l_quantity").sum())
    plan = _plan(out.df)
    assert "partial_sum" in plan  # map-side combine before the exchange


def test_limit_becomes_take_ordered(spark, sf_dir):
    od = td.TableFrame.from_spark(spark.read.parquet(f"{sf_dir}/orders.parquet"))
    out = od.sort("o_totalprice", descending=True).limit(5)
    # global sort + limit must fuse into TakeOrderedAndProject (no full sort)
    assert "TakeOrderedAndProject" in _plan(out.df)


def test_whole_stage_codegen_covers_expressions(spark, sf_dir):
    li = td.TableFrame.from_spark(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    out = li.with_columns(
        charge=td.col("l_extendedprice") * (1 - td.col("l_discount"))
    ).filter(td.col("charge") > 100).select("l_orderkey", "charge")
    plan = _plan(out.df)
    # executedPlan toString marks codegen stages with "*(n)"
    assert "WholeStageCodegen" in plan or "*(1)" in plan


def test_q2_semi_join_prefilters_fact_scan(spark, sf_dir):
    """q2: the part filter must reach the part scan as pushed predicates and
    the supplier->nation->region dim chain must broadcast (no shuffle of the
    fact side against dims)."""
    from tabsdata_spark import queries as registry
    df = registry.queries()["q2_min_cost_supplier"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(r_name,EUROPE)" in plan          # dim filter at the scan
    assert "GreaterThanOrEqual(p_size,1)" in plan    # part filter at the scan
    assert "BroadcastHashJoin" in plan               # dim chain broadcasts
    assert "partial_min" in plan                     # map-side combine


def test_q21_status_filter_pushed_and_no_cartesian(spark, sf_dir):
    """q21's EXISTS/NOT-EXISTS rewrite must stay equi-join shaped: status
    filter at the orders scan, no nested-loop/cartesian product anywhere."""
    from tabsdata_spark import queries as registry
    df = registry.queries()["q21_waiting_suppliers"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(o_orderstatus,F)" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
