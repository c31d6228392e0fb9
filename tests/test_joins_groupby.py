"""Join strategy + group-by tests (reference frame.py:1017-1173,
group_by.py)."""

import pytest

import tabsdata_spark as td


@pytest.fixture()
def lr(spark):
    left = td.TableFrame.from_dict(
        spark, {"k": [1, 2, 3, None], "lv": ["a", "b", "c", "d"]}
    )
    right = td.TableFrame.from_dict(
        spark, {"k": [2, 3, 4, None], "rv": ["x", "y", "z", "w"]}
    )
    return left, right


def test_inner_coalesces_key(lr):
    left, right = lr
    out = left.join(right, on="k").sort("k")
    assert out.columns == ["k", "lv", "rv"]
    assert out.to_dict()["k"] == [2, 3]


def test_join_nulls(lr):
    left, right = lr
    out = left.join(right, on="k", join_nulls=True)
    assert out.df.count() == 3  # null key matches null key


def test_left_right_full(lr):
    left, right = lr
    lj = left.join(right, on="k", how="left").sort("lv").to_dict()
    assert lj["rv"] == [None, "x", "y", None]
    rj = left.join(right, on="k", how="right")
    assert rj.df.count() == 4
    fj = left.join(right, on="k", how="full")
    assert fj.df.count() == 6  # 2 match + 2 left-only + 2 right-only
    # full keeps both keys (Polars coalesce=None behavior)
    assert "k" in fj.columns and "k_right" in fj.columns


def test_full_with_coalesce(lr):
    left, right = lr
    fj = left.join(right, on="k", how="full", coalesce=True)
    assert "k_right" not in fj.columns
    ks = fj.to_dict()["k"]
    assert 4 in [k for k in ks if k is not None]


def test_semi_anti(lr):
    left, right = lr
    assert left.join(right, on="k", how="semi").df.count() == 2
    anti = left.join(right, on="k", how="anti").sort("lv").to_dict()
    assert anti["lv"] == ["a", "d"]  # 1 and null don't match


def test_cross(lr):
    left, right = lr
    out = left.join(right, how="cross")
    assert out.df.count() == 16
    assert "k_right" in out.columns


def test_suffix_applies_to_clashing_nonkey_cols(spark):
    a = td.TableFrame.from_dict(spark, {"k": [1], "v": [10]})
    b = td.TableFrame.from_dict(spark, {"k": [1], "v": [20]})
    out = a.join(b, on="k")
    assert out.columns == ["k", "v", "v_right"]
    assert out.first_row() == (1, 10, 20)
    out2 = a.join(b, on="k", suffix="_b")
    assert "v_b" in out2.columns


def test_left_on_right_on_keeps_both_keys(spark):
    a = td.TableFrame.from_dict(spark, {"ak": [1, 2], "v": [10, 20]})
    b = td.TableFrame.from_dict(spark, {"bk": [2], "w": [99]})
    out = a.join(b, left_on="ak", right_on="bk")
    assert set(out.columns) == {"ak", "v", "bk", "w"}


def test_groupby_agg_and_shortcuts(spark):
    tf = td.TableFrame.from_dict(
        spark, {"g": ["a", "a", "b"], "x": [1, 3, 5], "y": [2.0, 4.0, 6.0]}
    )
    agg = tf.group_by("g").agg(n=td.col("x").len(), s=td.col("x").sum()).sort("g").to_dict()
    assert agg["n"] == [2, 1] and agg["s"] == [4, 5]
    ln = tf.group_by("g").len().sort("g").to_dict()
    assert ln["len"] == [2, 1]
    mx = tf.group_by("g").max().sort("g").to_dict()
    assert mx["x"] == [3, 5] and mx["y"] == [4.0, 6.0]
    sm = tf.group_by("g").sum().sort("g").to_dict()
    assert sm["x"] == [4, 5]
    me = tf.group_by("g").mean().sort("g").to_dict()
    assert me["x"] == [2.0, 5.0]
    md = tf.group_by("g").median().sort("g").to_dict()
    assert md["x"] == [2.0, 5.0]
    nu = tf.group_by("g").n_unique().sort("g").to_dict()
    assert nu["x"] == [2, 1]


def test_groupby_expression_key(spark):
    tf = td.TableFrame.from_dict(spark, {"x": [1, 2, 3, 4]})
    out = (
        tf.group_by(parity=td.col("x") % 2)
        .agg(s=td.col("x").sum())
        .sort("parity")
        .to_dict()
    )
    assert out["parity"] == [0, 1] and out["s"] == [6, 4]


def test_global_agg_empty_groupby(spark):
    tf = td.TableFrame.from_dict(spark, {"x": [1, 2, 3]})
    out = tf.group_by().agg(s=td.col("x").sum(), n=td.col("x").len())
    assert out.first_row() == (6, 3)


def test_approx_count_distinct_tolerance(spark, sf_dir):
    """approx_count_distinct is the 100TB path for n_unique; verify it lands
    within the configured rsd of the exact count."""
    import pyspark.sql.functions as F

    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact, approx = df.select(
        F.countDistinct("o_custkey").alias("e"),
        F.approx_count_distinct("o_custkey", 0.02).alias("a"),
    ).first()
    assert abs(approx - exact) / exact < 0.1


def test_agg_duplicate_output_names_raise(spark):
    """Polars raises DuplicateError when two agg outputs share a name;
    silently keeping the last corrupts downstream column resolution."""
    import pytest

    from tabsdata_spark.errors import DuplicateColumnError

    tf = td.TableFrame.from_dict(spark, {"g": [1, 1], "v": [1.0, 2.0]})
    with pytest.raises(DuplicateColumnError):
        tf.group_by("g").agg(td.col("v").sum().alias("x"),
                             x=td.col("v").mean())
    with pytest.raises(DuplicateColumnError):
        tf.group_by("g").agg(td.col("v").sum().alias("x"),
                             td.col("v").mean().alias("x"))


def test_agg_output_colliding_with_group_key_raises(spark):
    """An agg output aliased to a GROUP KEY name would silently produce a
    frame with two identical column names — Polars raises DuplicateError."""
    import pytest

    from tabsdata_spark.errors import DuplicateColumnError

    tf = td.TableFrame.from_dict(spark, {"g": [1, 1, 2], "v": [1, 2, 3]})
    with pytest.raises(DuplicateColumnError):
        tf.group_by("g").agg(g=td.col("v").sum())
    with pytest.raises(DuplicateColumnError):
        tf.group_by(td.col("g")).agg(td.col("v").sum().alias("g"))
    # non-colliding aliases still work
    out = tf.group_by("g").agg(s=td.col("v").sum())
    assert sorted(out.to_spark().collect()) == [(1, 3), (2, 3)]
