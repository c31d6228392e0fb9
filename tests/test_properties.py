"""Property-based relational invariants (hypothesis).

The reference has no randomized testing (SURVEY §5); these cover the
algebraic laws operator rewrites must preserve, over arbitrary small
frames (nulls included).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

import tabsdata_spark as td

ints_with_null = st.lists(st.one_of(st.integers(-50, 50), st.none()),
                          min_size=1, max_size=20)

SET = settings(max_examples=10, deadline=None)


def _tf(spark, vals):
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "idx int, v int")
    return td.TableFrame.from_spark(df)


@given(vals=ints_with_null)
@SET
def test_filter_partitions_rows(spark, vals):
    tf = _tf(spark, vals)
    p = td.col("v") > 0
    kept = tf.filter(p).df.count()
    # ~p drops nulls too (3-valued logic): null rows are in neither side
    dropped = tf.filter(~p).df.count()
    nulls = tf.filter(td.col("v").is_null()).df.count()
    assert kept + dropped + nulls == len(vals)


@given(a=ints_with_null, b=ints_with_null)
@SET
def test_concat_counts_add(spark, a, b):
    fa, fb = _tf(spark, a), _tf(spark, b)
    assert td.concat([fa, fb]).df.count() == len(a) + len(b)


@given(vals=ints_with_null)
@SET
def test_unique_is_subset_with_distinct_keys(spark, vals):
    tf = _tf(spark, vals)
    uq = tf.unique(subset="v").df
    got = [r.v for r in uq.collect()]
    assert len(got) == len(set(got))
    assert set(got) <= set(vals) | {None}


@given(vals=ints_with_null)
@SET
def test_sort_preserves_multiset(spark, vals):
    tf = _tf(spark, vals)
    out = [r.v for r in tf.sort("v").df.collect()]
    assert sorted((x for x in out if x is not None)) == \
           sorted(x for x in vals if x is not None)
    assert out.count(None) == vals.count(None)


@given(vals=ints_with_null, fill=st.integers(-5, 5))
@SET
def test_fill_null_removes_all_nulls(spark, vals, fill):
    tf = _tf(spark, vals)
    out = tf.fill_null(fill)
    assert out.df.filter("v IS NULL").count() == 0
    assert out.df.count() == len(vals)


@given(vals=ints_with_null)
@SET
def test_groupby_sum_equals_total(spark, vals):
    tf = _tf(spark, vals)
    per_group = tf.with_columns(g=td.col("v") % 3) \
        .group_by("g").agg(s=td.col("v").sum()).df.collect()
    total = sum(r.s for r in per_group if r.s is not None)
    expected = sum(x for x in vals if x is not None)
    assert total == expected or (expected == 0 and total == 0)
