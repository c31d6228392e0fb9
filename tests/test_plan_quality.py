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
