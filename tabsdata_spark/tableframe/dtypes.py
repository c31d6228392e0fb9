"""Data-type surface: tabsdata/Polars names -> Spark types.

Parity with reference client/td-sdk/tabsdata/tableframe/dtypes.py:14-50 and
the SURVEY §1.3 mapping table.  Unsigned ints promote to the next wider
signed type (Spark has no unsigned); UInt64/Int128 narrow to Decimal(20,0)/
Decimal(38,0) — a documented, tested narrowing.  Nested types are not
exposed (the reference comments them out, dtypes.py:52-60); Struct appears
only transiently in unnest/udf/grok, matching the reference.
"""

from __future__ import annotations

from typing import Any

import pyspark.sql.types as T

# sentinel classes so user code can say td.Int64 etc.
Boolean = T.BooleanType()
Int8 = T.ByteType()
Int16 = T.ShortType()
Int32 = T.IntegerType()
Int64 = T.LongType()
UInt8 = T.ShortType()
UInt16 = T.IntegerType()
UInt32 = T.LongType()
UInt64 = T.DecimalType(20, 0)
Int128 = T.DecimalType(38, 0)
Float32 = T.FloatType()
Float64 = T.DoubleType()
String = T.StringType()
Utf8 = T.StringType()
Date = T.DateType()
Datetime = T.TimestampType()
Time = T.LongType()  # seconds-of-day (Spark has no TimeType)
Duration = T.DayTimeIntervalType()
Null = T.NullType()
Categorical = T.StringType()
Enum = T.StringType()


def Decimal(precision: int = 38, scale: int = 0) -> T.DecimalType:
    return T.DecimalType(precision, scale)


_NAME_MAP: dict[str, T.DataType] = {
    "boolean": Boolean, "bool": Boolean,
    "int8": Int8, "int16": Int16, "int32": Int32, "int64": Int64,
    "uint8": UInt8, "uint16": UInt16, "uint32": UInt32, "uint64": UInt64,
    "int128": Int128,
    "float32": Float32, "float64": Float64, "float": Float64, "double": Float64,
    "string": String, "str": String, "utf8": String,
    "date": Date, "datetime": Datetime, "timestamp": Datetime,
    "time": Time, "duration": Duration, "null": Null,
    "categorical": Categorical, "enum": Enum,
}

# type-group sets (reference dtypes.py type groups)
INTEGER_DTYPES = {Int8, Int16, Int32, Int64}
FLOAT_DTYPES = {Float32, Float64}
NUMERIC_DTYPES = INTEGER_DTYPES | FLOAT_DTYPES
TEMPORAL_DTYPES = {Date, Datetime, Duration}


def to_spark_type(dtype: Any) -> T.DataType:
    """Accept a Spark DataType, one of the sentinels above, a python type,
    or a name string."""
    if isinstance(dtype, T.DataType):
        return dtype
    if isinstance(dtype, str):
        key = dtype.lower()
        if key in _NAME_MAP:
            return _NAME_MAP[key]
        return T._parse_datatype_string(dtype)  # e.g. "decimal(12,2)"
    if dtype is int:
        return Int64
    if dtype is float:
        return Float64
    if dtype is str:
        return String
    if dtype is bool:
        return Boolean
    if isinstance(dtype, type) and issubclass(dtype, T.DataType):
        return dtype()
    raise TypeError(f"cannot map dtype {dtype!r} to a Spark type")
