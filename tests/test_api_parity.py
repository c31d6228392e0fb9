"""API-parity watchdog (mirror of the reference's import-time surface diff,
frame.py:2849-2890): every operator named in SURVEY §2 must exist on the
corresponding object.  Catches silent surface regressions without running
Spark jobs — pure attribute checks.
"""

from __future__ import annotations

import tabsdata_spark as td
from tabsdata_spark.tableframe import selectors as cs
from tabsdata_spark.tableframe.expr import Expr

EXPR_METHODS = """
add sub mul truediv floordiv mod pow neg abs
eq eq_missing ne ne_missing lt le gt ge and_ or_ xor not_
is_between is_in is_null is_not_null is_nan is_not_nan
is_finite is_infinite is_unique
sqrt cbrt exp log log1p log10 sin cos tan sinh cosh tanh
arcsin arccos arctan arcsinh arccosh arctanh cot degrees radians
sign floor ceil round round_sig_figs clip shrink_dtype reinterpret
alias cast fill_null fill_nan filter hash slice rank diff
max min sum mean median n_unique count len first last
""".split()

STR_METHODS = """
to_date to_datetime to_time len_bytes len_chars
to_uppercase to_lowercase to_titlecase
strip_chars strip_chars_start strip_chars_end strip_prefix strip_suffix
pad_start pad_end zfill contains find ends_with starts_with
extract count_matches replace replace_all reverse slice head tail
to_integer contains_any replace_many grok
""".split()

DT_METHODS = """
add_business_days truncate replace combine to_string
millennium century year is_leap_year iso_year quarter month week weekday
day ordinal_day time date datetime hour minute second
millisecond microsecond nanosecond epoch timestamp
with_time_unit cast_time_unit convert_time_zone replace_time_zone
total_days total_hours total_minutes total_seconds total_milliseconds
total_microseconds total_nanoseconds
offset_by month_start month_end base_utc_offset dst_offset
""".split()

SELECTORS = """
all first last by_index by_name contains starts_with ends_with matches
alpha alphanumeric digit by_dtype integer signed_integer unsigned_integer
float numeric temporal binary boolean categorical date datetime decimal
duration object string time exclude
""".split()

FRAME_METHODS = """
select with_columns filter drop rename cast unnest fill_null fill_nan
drop_nulls drop_nans unique sort slice limit head tail first last
first_row last_row item extract_as_rows extract_as_columns clear
group_by join udf grok explain inspect
columns dtypes schema width has_cols assert_has_cols has_same_schema
is_empty
""".split()

DQ_CHECKS = """
is_null is_not_null is_nan is_not_nan is_null_or_nan is_not_null_or_nan
is_in is_not_in is_positive is_positive_or_zero is_negative
is_negative_or_zero is_zero is_between is_not_between expr fn
""".split()


def _missing(obj, names):
    return [n for n in names if not hasattr(obj, n)]


def test_expr_surface_complete():
    assert _missing(Expr, EXPR_METHODS) == []


def test_str_namespace_complete(spark):
    e = td.col("x").str
    assert _missing(e, STR_METHODS) == []


def test_dt_namespace_complete(spark):
    e = td.col("x").dt
    assert _missing(e, DT_METHODS) == []


def test_selectors_complete():
    assert _missing(cs, SELECTORS) == []


def test_frame_surface_complete(spark):
    tf = td.TableFrame.from_dict(spark, {"a": [1]})
    assert _missing(tf, FRAME_METHODS) == []


def test_dq_surface_complete(spark):
    tf = td.TableFrame.from_dict(spark, {"a": [1]})
    assert _missing(tf._dq, DQ_CHECKS) == []


def test_group_by_surface_complete(spark):
    tf = td.TableFrame.from_dict(spark, {"a": [1], "b": [2]})
    g = tf.group_by("a")
    # reference group_by exposes exactly these shortcuts (group_by.py:159-532
    # — first/last are Expr-level aggregations, not group-by methods)
    assert _missing(g, ["agg", "len", "count", "max", "mean", "median",
                        "min", "n_unique", "sum"]) == []


def test_blocked_methods_raise(spark):
    """The reference blocks these by design (_constants.py:52-82); our
    surface must refuse them too, not silently no-op."""
    tf = td.TableFrame.from_dict(spark, {"a": [1]})
    for name in ["join_asof", "explode", "rolling", "group_by_dynamic",
                 "melt", "shift", "interpolate", "top_k"]:
        try:
            getattr(tf, name)
            raised = False
        except Exception:
            raised = True
        assert raised, f"{name} should be blocked"
