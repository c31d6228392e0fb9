"""UDF, data-quality, grok, selectors, and system-column tests."""

import pytest

import tabsdata_spark as td
from tabsdata_spark.errors import ReservedColumnError
from tabsdata_spark.tableframe import selectors as cs
from tabsdata_spark.tableframe import _system as S


# ---------------------------------------------------------------- UDF
def test_udf_on_batch_unpacked(spark):
    tf = td.TableFrame.from_dict(spark, {"a": [1.0, 2.0], "b": [10.0, 20.0]})

    class AddMul(td.UDF):
        output_columns = [("s", "float64"), ("p", "float64")]

        def on_batch(self, a, b):
            return [a + b, a * b]

    out = tf.udf(["a", "b"], AddMul()).sort("a").to_dict()
    assert out["s"] == [11.0, 22.0]
    assert out["p"] == [10.0, 40.0]


def test_udf_on_element_list_signature(spark):
    tf = td.TableFrame.from_dict(spark, {"a": [1, 2]})

    class PlusOne(td.UDFList):
        output_columns = [("b", "int64")]

        def on_element(self, values):
            return [values[0] + 1]

    out = tf.udf(["a"], PlusOne()).sort("a").to_dict()
    assert out["b"] == [2, 3]


def test_udf_reserved_output_blocked(spark):
    class Bad(td.UDF):
        output_columns = [("$td.x", "int64")]

        def on_batch(self, a):
            return [a]

    tf = td.TableFrame.from_dict(spark, {"a": [1]})
    with pytest.raises(ReservedColumnError):
        tf.udf(["a"], Bad())


def test_udf_expression_input(spark):
    tf = td.TableFrame.from_dict(spark, {"a": [3.0]})

    class Sq(td.UDF):
        output_columns = [("sq", "float64")]

        def on_batch(self, x):
            return [x * x]

    out = tf.udf([td.col("a") + 1], Sq()).to_dict()
    assert out["sq"] == [16.0]


# ---------------------------------------------------------------- DQ
def test_dq_checks_naming_and_values(spark):
    tf = td.TableFrame.from_dict(spark, {"x": [-1.0, 0.0, 2.0]})
    out = (
        tf.dq.is_positive("x")
        .dq.is_zero("x", name="zero_flag")
        .dq.is_between("x", 0, 1)
        .sort("x")
        .to_dict()
    )
    assert out["x_is_positive_dq"] == [False, False, True]
    assert out["zero_flag"] == [False, True, False]
    assert out["x_is_between_dq"] == [False, True, False]


def test_dq_expr_and_fn(spark):
    tf = td.TableFrame.from_dict(spark, {"x": [1, 5]})
    out = tf.dq.expr(td.col("x") > 2, name="gt2").sort("x").to_dict()
    assert out["gt2"] == [False, True]
    out2 = (
        tf.dq.fn("x", lambda v: v % 2 == 1, name="odd")
        .sort("x")
        .to_dict()
    )
    assert out2["odd"] == [True, True]
    out3 = (
        tf.dq.fn("x", lambda s: s > 3, name="big", mode="batch")
        .sort("x")
        .to_dict()
    )
    assert out3["big"] == [False, True]


# ---------------------------------------------------------------- grok
def test_grok_frame_level(spark):
    tf = td.TableFrame.from_dict(
        spark,
        {"line": ["2024-03-05T10:30:00 ERROR disk full on 10.1.2.3",
                  "not a log line"]},
    )
    out = tf.grok(
        "line",
        "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} %{GREEDYDATA:msg}",
    ).sort("line", descending=True).to_dict()
    assert out["ts"] == [None, "2024-03-05T10:30:00"]
    assert out["level"] == [None, "ERROR"]
    assert out["msg"] == [None, "disk full on 10.1.2.3"]


def test_grok_typed_capture(spark):
    tf = td.TableFrame.from_dict(spark, {"s": ["val=42", "val=x"]})
    out = tf.grok("s", "val=%{INT:v:int}").sort("s").to_dict()
    assert out["v"] == [42, None]


def test_grok_ip_and_number(spark):
    tf = td.TableFrame.from_dict(spark, {"s": ["GET /x 200 1.5 from 192.168.0.1"]})
    out = tf.grok("s", "%{NUMBER:code:int} %{NUMBER:t:float} from %{IP:ip}").to_dict()
    assert out["code"] == [200] and out["t"] == [1.5]
    assert out["ip"] == ["192.168.0.1"]


# ---------------------------------------------------------------- selectors
def test_selectors_basic(spark):
    tf = td.TableFrame.from_dict(
        spark, {"ai": [1], "bf": [1.5], "cs": ["x"], "db": [True]}
    )
    schema = tf.schema
    assert cs.numeric()._resolve(schema) == ["ai", "bf"]
    assert cs.integer()._resolve(schema) == ["ai"]
    assert cs.float()._resolve(schema) == ["bf"]
    assert cs.string()._resolve(schema) == ["cs"]
    assert cs.boolean()._resolve(schema) == ["db"]
    assert cs.first()._resolve(schema) == ["ai"]
    assert cs.last()._resolve(schema) == ["db"]
    assert cs.starts_with("a", "b")._resolve(schema) == ["ai", "bf"]
    assert cs.contains("s")._resolve(schema) == ["cs"]
    assert cs.matches("^[ab]")._resolve(schema) == ["ai", "bf"]
    assert cs.by_index(0, -1)._resolve(schema) == ["ai", "db"]
    assert cs.by_name("cs", "ai")._resolve(schema) == ["ai", "cs"]


def test_selector_algebra(spark):
    tf = td.TableFrame.from_dict(spark, {"ai": [1], "bf": [1.5], "cs": ["x"]})
    schema = tf.schema
    assert (cs.numeric() - cs.float())._resolve(schema) == ["ai"]
    assert (cs.integer() | cs.string())._resolve(schema) == ["ai", "cs"]
    assert (~cs.numeric())._resolve(schema) == ["cs"]
    assert (cs.all() & cs.numeric())._resolve(schema) == ["ai", "bf"]
    assert cs.exclude("ai")._resolve(schema) == ["bf", "cs"]


def test_select_with_selector(spark):
    tf = td.TableFrame.from_dict(spark, {"ai": [1], "bf": [1.5], "cs": ["x"]})
    out = tf.select(cs.numeric())
    assert out.columns == ["ai", "bf"]
    out2 = tf.drop(cs.string())
    assert out2.columns == ["ai", "bf"]


# ---------------------------------------------------------------- system cols
def test_system_columns_materialize_on_store(spark):
    tf = td.TableFrame.from_dict(spark, {"x": [1, 2]})
    stored = S.materialize_for_store(tf._df, tf._props)
    assert set(S.SYSTEM_COLUMNS).issubset(set(stored.columns))
    rows = stored.collect()
    ids = [r[S.COL_ID] for r in rows]
    assert len(set(ids)) == 2  # unique per row
    assert rows[0][S.COL_VERSION] == tf._props.version


def test_virtual_version_columns_readable(spark):
    tf = td.TableFrame.from_dict(spark, {"x": [1]})
    out = tf.select("x", "$td.ver.version")
    vals = out._df.collect()[0]
    assert vals[1] == tf._props.version
    # but user frames keep them out of .columns
    assert tf.columns == ["x"]


def test_join_drops_right_system_columns(spark):
    a = td.TableFrame.from_dict(spark, {"k": [1], "v": [1]})
    b = td.TableFrame.from_dict(spark, {"k": [1], "w": [2]})
    stored_b = td.TableFrame._from_df(
        S.materialize_for_store(b._df, b._props), b._props)
    out = a.join(stored_b, on="k")
    assert S.system_columns_present(out._df) == []
    assert out.columns == ["k", "v", "w"]
