"""Frame operation tests mirroring the reference's operator unit suites
(reference: tests_tabsdata/test_tabsdata/test_tableframe/lazyframe/)."""

import pytest

import tabsdata_spark as td
from tabsdata_spark.errors import (
    MissingColumnError, ReservedColumnError, ShapeError,
)


def test_select_and_named(tiny):
    out = tiny.select("a", doubled=td.col("a") * 2)
    assert out.columns == ["a", "doubled"]
    assert out.to_dict()["doubled"] == [2, 4, 6, 8, 10]


def test_with_columns_replaces_and_appends(tiny):
    out = tiny.with_columns(a=td.col("a") + 100, c=td.lit(1))
    d = out.to_dict()
    assert d["a"] == [101, 102, 103, 104, 105]
    assert d["c"] == [1] * 5
    assert out.columns == ["a", "b", "s", "c"]


def test_filter_multiple_predicates_anded(tiny):
    out = tiny.filter(td.col("a") > 1, td.col("a") < 5)
    assert sorted(out.to_dict()["a"]) == [2, 3, 4]


def test_drop_strict_raises(tiny):
    with pytest.raises(MissingColumnError):
        tiny.drop("nope")
    assert tiny.drop("nope", strict=False).columns == ["a", "b", "s"]
    assert tiny.drop("b").columns == ["a", "s"]


def test_rename_strict_and_reserved(tiny):
    assert tiny.rename({"a": "alpha"}).columns == ["alpha", "b", "s"]
    with pytest.raises(MissingColumnError):
        tiny.rename({"zz_col": "x"})
    with pytest.raises(ReservedColumnError):
        tiny.rename({"a": "$td.a"})


def test_cast_per_column_and_per_dtype(tiny):
    out = tiny.cast({"a": "string"})
    assert out.schema["a"].simpleString() == "string"
    out2 = tiny.cast({td.Int64: td.Int32})
    assert out2.schema["a"].simpleString() == "int"


def test_cast_nonstrict_bad_values_null(spark):
    tf = td.TableFrame.from_dict(spark, {"x": ["1", "nope", "3"]})
    vals = tf.cast({"x": "int64"}).to_dict()["x"]
    assert vals == [1, None, 3]


def test_fill_and_drop_nulls(tiny):
    assert tiny.fill_null(0).to_dict()["b"][3] == 0.0
    assert tiny.drop_nulls("b").df.count() == 4
    assert tiny.drop_nulls(["b", "s"]).df.count() == 3


def test_fill_and_drop_nans(tiny):
    filled = tiny.fill_nan(-1.0).to_dict()["b"]
    assert filled[1] == -1.0
    assert tiny.drop_nans("b").df.count() == 4  # null kept, NaN dropped


def test_unique_keep_semantics(spark):
    tf = td.TableFrame.from_dict(
        spark, {"k": [1, 1, 2, 2, 3], "v": [10, 20, 30, 40, 50]}
    ).sort("v")
    assert tf.unique(subset="k").df.count() == 3
    first = tf.unique(subset="k", keep="first").sort("k").to_dict()
    assert first["v"] == [10, 30, 50]
    last = tf.unique(subset="k", keep="last").sort("k").to_dict()
    assert last["v"] == [20, 40, 50]
    none = tf.unique(subset="k", keep="none").to_dict()
    assert none["v"] == [50]


def test_sort_nulls_and_desc(tiny):
    out = tiny.sort("b", descending=True, nulls_last=True).to_dict()["b"]
    assert out[-1] is None
    asc = tiny.sort("s", nulls_last=False).to_dict()["s"]
    assert asc[0] is None


def test_slice_limit_head_tail(spark):
    tf = td.TableFrame.from_dict(spark, {"x": list(range(10))}).sort("x")
    assert tf.slice(3, 4).to_dict()["x"] == [3, 4, 5, 6]
    assert tf.limit(2).to_dict()["x"] == [0, 1]
    assert tf.head(3).to_dict()["x"] == [0, 1, 2]
    assert tf.tail(3).to_dict()["x"] == [7, 8, 9]
    assert tf.first().to_dict()["x"] == [0]
    assert tf.last().to_dict()["x"] == [9]


def test_first_last_row_item(spark):
    tf = td.TableFrame.from_dict(spark, {"x": [7, 8], "y": ["a", "b"]}).sort("x")
    assert tf.first_row() == (7, "a")
    assert tf.last_row(named=True) == {"x": 8, "y": "b"}
    assert tf.select("y").limit(1).item() == "a"
    with pytest.raises(ShapeError):
        tf.item()  # two rows, two cols


def test_extract_as_rows_columns(spark):
    tf = td.TableFrame.from_dict(spark, {"x": [1, 2, 3]}).sort("x")
    assert tf.extract_as_rows(2, offset=1) == [{"x": 2}, {"x": 3}]
    assert tf.extract_as_columns(2) == {"x": [1, 2]}


def test_clear_keeps_schema(tiny):
    out = tiny.clear()
    assert out.columns == ["a", "b", "s"]
    assert out.is_empty()


def test_unnest(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(1, (2, "x"))], "a int, st struct<b:int,c:string>")
    tf = td.TableFrame.from_spark(df).unnest("st")
    assert tf.columns == ["a", "b", "c"]
    assert tf.first_row() == (1, 2, "x")


def test_schema_predicates(tiny):
    assert tiny.has_cols(["a", "b"])
    assert not tiny.has_cols("zzz")
    tiny.assert_has_cols("a")
    with pytest.raises(MissingColumnError):
        tiny.assert_has_cols(["a", "qq"])
    assert tiny.has_same_schema(tiny.filter(td.col("a") > 1))
    assert not tiny.has_same_schema(tiny.drop("a"))
    assert tiny.width == 3


def test_reserved_column_blocked(tiny):
    with pytest.raises(ReservedColumnError):
        tiny.with_columns(**{"$td.zzz": td.lit(1)})


def test_concat_modes(spark):
    a = td.TableFrame.from_dict(spark, {"x": [1], "y": ["a"]})
    b = td.TableFrame.from_dict(spark, {"x": [2], "y": ["b"]})
    c = td.TableFrame.from_dict(spark, {"x": [3], "z": [True]})
    assert td.concat([a, b]).df.count() == 2
    diag = td.concat([a, c], how="diagonal")
    assert set(diag.columns) == {"x", "y", "z"}
    assert diag.df.count() == 2
    from tabsdata_spark.errors import SchemaMismatchError

    with pytest.raises(SchemaMismatchError):
        td.concat([a, c], how="vertical")


def test_concat_vertical_relaxed(spark):
    a = td.TableFrame.from_dict(spark, {"x": [1]})
    b = td.TableFrame.from_dict(spark, {"x": [2.5]})
    out = td.concat([a, b], how="vertical_relaxed")
    assert out.schema["x"].simpleString() == "double"
    assert sorted(out.to_dict()["x"]) == [1.0, 2.5]


def test_concat_str_function(spark):
    tf = td.TableFrame.from_dict(spark, {"a": ["x"], "b": ["y"]})
    out = tf.select(j=td.concat_str(td.col("a"), td.lit("-"), td.col("b")))
    assert out.item() == "x-y"


def test_unsigned_int128_narrowing(spark):
    """Documented type narrowing (SURVEY §1.3): UInt8/16/32 promote to the
    next wider signed type, UInt64/Int128 -> Decimal(20,0)/(38,0)."""
    tf = td.TableFrame.from_dict(spark, {"v": [1, 200, 70000]})
    out = tf.select(
        u8=td.col("v").cast("uint8"),
        u32=td.col("v").cast("uint32"),
        u64=td.col("v").cast("uint64"),
        i128=td.col("v").cast("int128"),
    )
    types = dict(out.df.dtypes)
    assert types == {"u8": "smallint", "u32": "bigint",
                     "u64": "decimal(20,0)", "i128": "decimal(38,0)"}
    big = out.df.collect()[-1]
    assert int(big.u64) == 70000 and int(big.i128) == 70000


def test_cast_strict_raises_on_bad_value(spark):
    """Polars strict-cast parity: conversion failure raises instead of
    nulling (raise_error guard over the legacy cast)."""
    tf = td.TableFrame.from_dict(spark, {"x": ["1", "nope", "3"]})
    try:
        tf.cast({"x": "int64"}, strict=True).to_dict()
        raise AssertionError("strict cast should raise on 'nope'")
    except Exception as e:
        assert "strict cast" in str(e) or "SparkRuntime" in type(e).__name__
    # clean values cast fine under strict
    ok = td.TableFrame.from_dict(spark, {"x": ["1", "2"]})
    assert ok.cast({"x": "int64"}, strict=True).to_dict()["x"] == [1, 2]


def test_cast_nonstrict_avoids_try_cast(spark):
    """On ANSI-off sessions the non-strict cast must emit a legacy Cast,
    not TryCast: try_cast's failure path is exception-driven and ~20x
    slower when most values fail to parse (100 TB hazard)."""
    tf = td.TableFrame.from_dict(spark, {"x": ["a", "b"]})
    out = tf.select(y=td.col("x").cast("long"))
    plan = out.df._jdf.queryExecution().analyzed().toString()
    assert "try_cast" not in plan.lower().replace("trycast", "try_cast")
    assert out.to_dict()["y"] == [None, None]


# ---------------------------------------------------------------------------
# edge-contract regressions (round 7): Polars-lazy parity for argument
# validation and positional semantics (reference delegates these to
# pl.LazyFrame — lazyframe/frame.py:820 sort, 1445 rename, 1764 unique,
# 2289 head, 1017 join)
# ---------------------------------------------------------------------------

def test_rename_swap_is_atomic(spark):
    """All renames apply simultaneously: {"a": "b", "b": "a"} swaps the
    two columns.  Sequential withColumnRenamed silently merged them."""
    tf = td.TableFrame.from_dict(spark, {"a": [1, 2], "b": ["x", "y"]})
    d = tf.rename({"a": "b", "b": "a"}).to_dict()
    assert d == {"b": [1, 2], "a": ["x", "y"]}


def test_rename_collision_raises(spark):
    from tabsdata_spark.errors import DuplicateColumnError

    tf = td.TableFrame.from_dict(spark, {"a": [1], "b": [2]})
    with pytest.raises(DuplicateColumnError):
        tf.rename({"a": "b"})
    with pytest.raises(DuplicateColumnError):
        tf.rename({"a": "c", "b": "c"})


def test_unique_invalid_keep_raises(tiny):
    with pytest.raises(ValueError, match="keep must be one of"):
        tiny.unique(keep="bogus")


def test_sort_descending_length_mismatch_raises(tiny):
    with pytest.raises(ValueError, match="descending"):
        tiny.sort("a", "b", descending=[True])
    with pytest.raises(ValueError, match="nulls_last"):
        tiny.sort("a", "b", nulls_last=[True, False, True])


def test_negative_head_tail_limit_raise(tiny):
    for fn in (tiny.head, tiny.tail, tiny.limit):
        with pytest.raises(ValueError, match="negative slice lengths"):
            fn(-1)
    with pytest.raises(ValueError, match="negative slice lengths"):
        tiny.slice(0, -1)


def test_slice_negative_offset(spark):
    """Negative offsets count from the end with Python-slice clamping
    (polars slice_offsets): slice(-2) = last 2; slice(-3, 2) = 2 rows
    starting 3 from the end; slice(-9, 6) on 4 rows = rows [0, 1)."""
    tf = td.TableFrame.from_dict(spark, {"a": [10, 20, 30, 40]}).sort("a")
    assert [r.a for r in tf.slice(-2).df.collect()] == [30, 40]
    assert [r.a for r in tf.slice(-3, 2).df.collect()] == [20, 30]
    assert [r.a for r in tf.slice(-9, 6).df.collect()] == [10]
    assert tf.slice(-9, 2).df.count() == 0


def test_item_negative_row(spark):
    tf = td.TableFrame.from_dict(spark, {"a": [10, 20, 30, 40]}).sort("a")
    assert tf.item(-1, "a") == 40
    assert tf.item(-4, "a") == 10
    assert tf.select("a").item(-2) == 30
    with pytest.raises(ShapeError):
        tf.item(-5, "a")


def test_unnest_validates_targets(tiny):
    from tabsdata_spark.errors import SchemaMismatchError

    with pytest.raises(MissingColumnError):
        tiny.unnest("nope")
    with pytest.raises(SchemaMismatchError):
        tiny.unnest("a")


def test_join_argument_validation(spark):
    left = td.TableFrame.from_dict(spark, {"a": [1], "b": [2]})
    right = td.TableFrame.from_dict(spark, {"a": [1], "c": [3]})
    with pytest.raises(ValueError, match="requires 'on'"):
        left.join(right)
    with pytest.raises(MissingColumnError):
        left.join(right, on="zz")
    with pytest.raises(ValueError, match="left_on has 2"):
        left.join(right, left_on=["a", "b"], right_on=["a"])
    with pytest.raises(ValueError, match="together"):
        left.join(right, on="a", left_on="a", right_on="a")
    with pytest.raises(ValueError, match="cross join"):
        left.join(right, on="a", how="cross")


def test_cast_missing_column_raises(tiny):
    with pytest.raises(MissingColumnError):
        tiny.cast({"nope": "int"})


def test_select_duplicate_output_raises(spark):
    from tabsdata_spark.errors import DuplicateColumnError

    tf = td.TableFrame.from_dict(spark, {"a": [1], "b": [2]})
    with pytest.raises(DuplicateColumnError):
        tf.select(td.col("a").alias("z"), td.col("b").alias("z"))


def test_udf_rejects_raw_callable(spark):
    tf = td.TableFrame.from_dict(spark, {"a": [1]})
    with pytest.raises(TypeError, match="UDF instance"):
        tf.udf("a", lambda x: x)


def test_with_columns_parallel_semantics(spark):
    """Polars with_columns: all expressions evaluate against the INPUT
    frame in one projection; replacing a column and reading it in the
    same call sees the OLD value, and duplicate targets raise."""
    from tabsdata_spark.errors import DuplicateColumnError

    tf = td.TableFrame.from_dict(spark, {"a": [1, 2]})
    d = tf.with_columns(a=td.col("a") * 10, b=td.col("a") + 1).to_dict()
    assert d["a"] == [10, 20]
    assert d["b"] == [2, 3]  # old a, not the new one
    with pytest.raises(DuplicateColumnError):
        tf.with_columns(td.col("a").alias("z"), z=td.col("a"))
