"""Expression surface tests (reference: test_tableframe/expr/test_expr.py)."""

import math

import pytest

import tabsdata_spark as td


def col_vals(tf, **named):
    return tf.select(**named).to_dict()


def test_arithmetic(spark):
    tf = td.TableFrame.from_dict(spark, {"x": [7.0], "y": [2.0]})
    d = col_vals(
        tf,
        add=td.col("x") + td.col("y"),
        sub=td.col("x").sub(td.col("y")),
        mul=td.col("x") * td.col("y"),
        div=td.col("x") / td.col("y"),
        fdiv=td.col("x") // td.col("y"),
        mod=td.col("x") % td.col("y"),
        pw=td.col("x") ** 2,
        neg=-td.col("x"),
        ab=abs(-td.col("x")),
        radd=1 + td.col("x"),
        rsub=10 - td.col("x"),
    )
    assert d["add"] == [9.0] and d["sub"] == [5.0] and d["mul"] == [14.0]
    assert d["div"] == [3.5] and d["fdiv"] == [3] and d["mod"] == [1.0]
    assert d["pw"] == [49.0] and d["neg"] == [-7.0] and d["ab"] == [7.0]
    assert d["radd"] == [8.0] and d["rsub"] == [3.0]


def test_comparisons_and_boolean(spark):
    tf = td.TableFrame.from_dict(spark, {"x": [1, 2, None]})
    d = col_vals(
        tf,
        eq=td.col("x") == 2,
        eqm=td.col("x").eq_missing(None),
        nem=td.col("x").ne_missing(2),
        band=(td.col("x") > 0) & (td.col("x") < 2),
        bor=(td.col("x") == 1) | (td.col("x") == 2),
        inv=~(td.col("x") == 1),
    )
    assert d["eq"] == [False, True, None]
    assert d["eqm"] == [False, False, True]
    assert d["nem"] == [True, False, True]


def test_predicates(spark):
    tf = td.TableFrame.from_spark(
        spark.createDataFrame(
            [(1.0,), (float("nan"),), (None,), (4.0,)], "x double")
    )
    d = col_vals(
        tf,
        nn=td.col("x").is_nan(),
        nnn=td.col("x").is_not_nan(),
        nl=td.col("x").is_null(),
        nnl=td.col("x").is_not_null(),
        fin=td.col("x").is_finite(),
        inf=td.col("x").is_infinite(),
        btw=td.col("x").is_between(0, 2),
        isin=td.col("x").is_in([4.0]),
    )
    assert d["nn"] == [False, True, False, False]  # Spark isnan(null)=false
    assert d["nl"] == [False, False, True, False]
    assert d["fin"][0] is True and d["fin"][1] is False and d["fin"][3] is True
    assert d["inf"][0] is False
    assert d["btw"] == [True, False, None, False]
    assert d["isin"] == [False, False, None, True]


def test_between_closed_variants(spark):
    tf = td.TableFrame.from_dict(spark, {"x": [1, 2, 3]})
    assert col_vals(tf, v=td.col("x").is_between(1, 3, "left"))["v"] == [True, True, False]
    assert col_vals(tf, v=td.col("x").is_between(1, 3, "right"))["v"] == [False, True, True]
    assert col_vals(tf, v=td.col("x").is_between(1, 3, "none"))["v"] == [False, True, False]


def test_math_functions(spark):
    tf = td.TableFrame.from_dict(spark, {"x": [0.5]})
    d = col_vals(
        tf,
        sq=td.col("x").sqrt(), cb=td.col("x").cbrt(), ex=td.col("x").exp(),
        lg=td.col("x").log(), l1=td.col("x").log1p(), l10=td.col("x").log10(),
        sn=td.col("x").sin(), cs=td.col("x").cos(), tn=td.col("x").tan(),
        sh=td.col("x").sinh(), ch=td.col("x").cosh(), th=td.col("x").tanh(),
        asn=td.col("x").arcsin(), acs=td.col("x").arccos(), atn=td.col("x").arctan(),
        ash=td.col("x").arcsinh(), ath=td.col("x").arctanh(),
        ct=td.col("x").cot(), dg=td.col("x").degrees(), rd=td.col("x").radians(),
    )
    x = 0.5
    assert abs(d["sq"][0] - math.sqrt(x)) < 1e-12
    assert abs(d["cb"][0] - x ** (1 / 3)) < 1e-12
    assert abs(d["ex"][0] - math.exp(x)) < 1e-12
    assert abs(d["lg"][0] - math.log(x)) < 1e-12
    assert abs(d["sn"][0] - math.sin(x)) < 1e-12
    assert abs(d["th"][0] - math.tanh(x)) < 1e-12
    assert abs(d["asn"][0] - math.asin(x)) < 1e-12
    assert abs(d["ct"][0] - 1 / math.tan(x)) < 1e-12
    assert abs(d["dg"][0] - math.degrees(x)) < 1e-12


def test_round_clip_sign(spark):
    tf = td.TableFrame.from_dict(spark, {"x": [-3.456, 0.0, 12.345]})
    d = col_vals(
        tf,
        r=td.col("x").round(1),
        c=td.col("x").clip(-1, 10),
        s=td.col("x").sign(),
        f=td.col("x").floor(),
        ce=td.col("x").ceil(),
    )
    assert d["r"] == [-3.5, 0.0, 12.3]
    assert d["c"] == [-1.0, 0.0, 10.0]
    assert d["s"] == [-1.0, 0.0, 1.0]


def test_round_sig_figs(spark):
    tf = td.TableFrame.from_dict(spark, {"x": [1234.5, 0.012345, 0.0]})
    d = col_vals(tf, v=td.col("x").round_sig_figs(2))
    assert d["v"][0] == 1200.0
    assert abs(d["v"][1] - 0.012) < 1e-12
    assert d["v"][2] == 0.0


def test_fill_null_nan_filter_hash(spark):
    tf = td.TableFrame.from_spark(
        spark.createDataFrame([(1.0,), (None,), (float("nan"),)], "x double")
    )
    d = col_vals(tf, fn=td.col("x").fill_null(9.9), fnan=td.col("x").fill_nan(8.8))
    assert d["fn"][1] == 9.9
    assert d["fnan"][2] == 8.8
    h = col_vals(tf, h=td.col("x").hash())["h"]
    assert isinstance(h[0], int)
    agg = (
        td.TableFrame.from_dict(spark, {"g": [1, 1], "v": [5, 50]})
        .group_by("g")
        .agg(s=td.col("v").filter(td.col("v") < 10).sum())
        .to_dict()
    )
    assert agg["s"] == [5]


def test_aggregation_exprs(spark):
    tf = td.TableFrame.from_dict(spark, {"g": ["a", "a", "b"], "v": [1, 3, 10]})
    out = (
        tf.group_by("g")
        .agg(
            mx=td.col("v").max(), mn=td.col("v").min(), sm=td.col("v").sum(),
            mean=td.col("v").mean(), med=td.col("v").median(),
            nu=td.col("v").n_unique(), cnt=td.col("v").count(), ln=td.col("v").len(),
            fst=td.col("v").first(), lst=td.col("v").last(),
        )
        .sort("g")
        .to_dict()
    )
    assert out["mx"] == [3, 10] and out["mn"] == [1, 10]
    assert out["sm"] == [4, 10] and out["mean"] == [2.0, 10.0]
    assert out["med"] == [2.0, 10.0]
    assert out["nu"] == [2, 1] and out["cnt"] == [2, 1] and out["ln"] == [2, 1]


def test_rank_methods(spark):
    tf = td.TableFrame.from_dict(spark, {"v": [10, 20, 20, 30]})
    d = tf.select(
        mn=td.col("v").rank("min"), mx=td.col("v").rank("max"),
        dn=td.col("v").rank("dense"), od=td.col("v").rank("ordinal"),
        av=td.col("v").rank("average"),
    ).sort("mn").to_dict()
    assert d["mn"] == [1, 2, 2, 4]
    assert d["mx"] == [1, 3, 3, 4]
    assert d["dn"] == [1, 2, 2, 3]
    assert sorted(d["od"]) == [1, 2, 3, 4]
    assert d["av"] == [1.0, 2.5, 2.5, 4.0]


def test_diff_with_order(spark):
    tf = td.TableFrame.from_dict(spark, {"t": [1, 2, 3], "v": [10, 15, 30]})
    d = tf.select("t", dv=td.col("v").diff(order_by="t")).sort("t").to_dict()
    assert d["dv"] == [None, 5, 15]


def test_is_unique(spark):
    tf = td.TableFrame.from_dict(spark, {"v": [1, 2, 2, 3]})
    d = tf.select("v", u=td.col("v").is_unique()).sort("v").to_dict()
    assert d["u"] == [True, False, False, True]


def test_when_then_otherwise(spark):
    tf = td.TableFrame.from_dict(spark, {"x": [1, 5, 10]})
    d = tf.select(
        lbl=td.when(td.col("x") < 3).then("lo")
        .when(td.col("x") < 8).then("mid").otherwise("hi")
    ).to_dict()
    assert d["lbl"] == ["lo", "mid", "hi"]


def test_log_family_ieee_domain(spark):
    """Polars/IEEE: log of a negative is NaN, log of the domain boundary
    is -inf; Spark's SQL logs return NULL for both and must be mapped."""
    import math

    tf = td.TableFrame.from_spark(
        spark.createDataFrame([(-4.0,), (0.0,), (math.e,), (None,)], "x double"))
    d = tf.select(ln=td.col("x").log(),
                  l10=td.col("x").log10(),
                  l2=td.col("x").log(2),
                  l1p=td.col("x").log1p()).to_dict()
    assert math.isnan(d["ln"][0]) and d["ln"][1] == float("-inf")
    assert abs(d["ln"][2] - 1.0) < 1e-12 and d["ln"][3] is None
    assert math.isnan(d["l10"][0]) and d["l10"][1] == float("-inf")
    assert math.isnan(d["l2"][0]) and d["l2"][1] == float("-inf")
    # log1p domain shifts to -1
    assert d["l1p"][1] == math.log1p(0.0)
    tf2 = td.TableFrame.from_spark(
        spark.createDataFrame([(-2.0,), (-1.0,)], "x double"))
    d2 = tf2.select(v=td.col("x").log1p()).to_dict()["v"]
    assert math.isnan(d2[0]) and d2[1] == float("-inf")
