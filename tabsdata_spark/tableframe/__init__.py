from . import dtypes, selectors
from .dtypes import (
    Boolean, Categorical, Date, Datetime, Decimal, Duration, Enum, Float32,
    Float64, Int8, Int16, Int32, Int64, Int128, Null, String, Time, UInt8,
    UInt16, UInt32, UInt64, Utf8,
)
from .expr import Expr
from .frame import TableFrame
from .functions import Column, col, concat, concat_str, lit, when
from .group_by import TableFrameGroupBy
from .udf import UDF, UDFList, UDFUnpacked

__all__ = [
    "TableFrame", "TableFrameGroupBy", "Expr", "col", "lit", "when", "concat",
    "Column", "concat_str", "UDF", "UDFList", "UDFUnpacked", "dtypes", "selectors",
    "Boolean", "Date", "Datetime", "Decimal", "Duration", "Float32", "Float64",
    "Int8", "Int16", "Int32", "Int64", "Int128", "Null", "String", "Time",
    "UInt8", "UInt16", "UInt32", "UInt64", "Utf8", "Categorical", "Enum",
]
