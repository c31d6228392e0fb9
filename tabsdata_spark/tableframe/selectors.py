"""Column selectors (reference tableframe/selectors.py, 1858 LoC).

Pure-Python meta-expressions resolved against the frame schema at bind time
— zero engine cost.  System columns are auto-excluded (selectors.py:34-47).
Composable with `| & - ~` (SelectorProxy, selectors.py:28).
"""

from __future__ import annotations

import re as _re
from typing import Any, Callable, Sequence

import pyspark.sql.types as T

from .dtypes import to_spark_type


class SelectorProxy:
    """A predicate over (name, dtype) pairs, resolved lazily."""

    def __init__(self, fn: Callable[[str, T.DataType, int, int], bool]):
        self._fn = fn

    def _resolve(self, schema: dict[str, T.DataType]) -> list[str]:
        items = list(schema.items())
        n = len(items)
        return [name for i, (name, dt) in enumerate(items) if self._fn(name, dt, i, n)]

    def __or__(self, other: "SelectorProxy") -> "SelectorProxy":
        return SelectorProxy(lambda nm, dt, i, n: self._fn(nm, dt, i, n) or other._fn(nm, dt, i, n))

    def __and__(self, other: "SelectorProxy") -> "SelectorProxy":
        return SelectorProxy(lambda nm, dt, i, n: self._fn(nm, dt, i, n) and other._fn(nm, dt, i, n))

    def __sub__(self, other: "SelectorProxy") -> "SelectorProxy":
        return SelectorProxy(lambda nm, dt, i, n: self._fn(nm, dt, i, n) and not other._fn(nm, dt, i, n))

    def __invert__(self) -> "SelectorProxy":
        return SelectorProxy(lambda nm, dt, i, n: not self._fn(nm, dt, i, n))


def all() -> SelectorProxy:  # noqa: A001
    return SelectorProxy(lambda nm, dt, i, n: True)


def first() -> SelectorProxy:
    return SelectorProxy(lambda nm, dt, i, n: i == 0)


def last() -> SelectorProxy:
    return SelectorProxy(lambda nm, dt, i, n: i == n - 1)


def by_index(*indices: int) -> SelectorProxy:
    idx = set(indices)
    return SelectorProxy(lambda nm, dt, i, n: i in idx or (i - n) in idx)


def by_name(*names: str) -> SelectorProxy:
    flat: set[str] = set()
    for x in names:
        flat.update(x) if isinstance(x, (list, tuple, set)) else flat.add(x)
    return SelectorProxy(lambda nm, dt, i, n: nm in flat)


def contains(*substrings: str) -> SelectorProxy:
    return SelectorProxy(lambda nm, dt, i, n: any(s in nm for s in substrings))


def starts_with(*prefixes: str) -> SelectorProxy:
    return SelectorProxy(lambda nm, dt, i, n: nm.startswith(tuple(prefixes)))


def ends_with(*suffixes: str) -> SelectorProxy:
    return SelectorProxy(lambda nm, dt, i, n: nm.endswith(tuple(suffixes)))


def matches(pattern: str) -> SelectorProxy:
    rx = _re.compile(pattern)
    return SelectorProxy(lambda nm, dt, i, n: rx.search(nm) is not None)


def alpha(ascii_only: bool = True) -> SelectorProxy:
    return SelectorProxy(lambda nm, dt, i, n: nm.isalpha())


def alphanumeric(ascii_only: bool = True) -> SelectorProxy:
    return SelectorProxy(lambda nm, dt, i, n: nm.isalnum())


def digit() -> SelectorProxy:
    return SelectorProxy(lambda nm, dt, i, n: nm.isdigit())


def by_dtype(*dtypes: Any) -> SelectorProxy:
    targets = {to_spark_type(d).simpleString() for d in dtypes}
    return SelectorProxy(lambda nm, dt, i, n: dt.simpleString() in targets)


_INT_T = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_T = (T.FloatType, T.DoubleType)


def integer() -> SelectorProxy:
    return SelectorProxy(lambda nm, dt, i, n: isinstance(dt, _INT_T))


def signed_integer() -> SelectorProxy:
    return integer()


def unsigned_integer() -> SelectorProxy:
    """Spark has no unsigned ints (SURVEY §1.3) -> empty selection."""
    return SelectorProxy(lambda nm, dt, i, n: False)


def float() -> SelectorProxy:  # noqa: A001
    return SelectorProxy(lambda nm, dt, i, n: isinstance(dt, _FLOAT_T))


def numeric() -> SelectorProxy:
    return SelectorProxy(
        lambda nm, dt, i, n: isinstance(dt, _INT_T + _FLOAT_T + (T.DecimalType,))
    )


def temporal() -> SelectorProxy:
    return SelectorProxy(
        lambda nm, dt, i, n: isinstance(
            dt, (T.DateType, T.TimestampType, T.DayTimeIntervalType)
        )
    )


def binary() -> SelectorProxy:
    return SelectorProxy(lambda nm, dt, i, n: isinstance(dt, T.BinaryType))


def boolean() -> SelectorProxy:
    return SelectorProxy(lambda nm, dt, i, n: isinstance(dt, T.BooleanType))


def categorical() -> SelectorProxy:
    return SelectorProxy(lambda nm, dt, i, n: False)  # categorical -> string


def date() -> SelectorProxy:
    return SelectorProxy(lambda nm, dt, i, n: isinstance(dt, T.DateType))


def datetime() -> SelectorProxy:
    return SelectorProxy(lambda nm, dt, i, n: isinstance(dt, T.TimestampType))


def decimal() -> SelectorProxy:
    return SelectorProxy(lambda nm, dt, i, n: isinstance(dt, T.DecimalType))


def duration() -> SelectorProxy:
    return SelectorProxy(lambda nm, dt, i, n: isinstance(dt, T.DayTimeIntervalType))


def object() -> SelectorProxy:  # noqa: A001
    return SelectorProxy(lambda nm, dt, i, n: False)


def string() -> SelectorProxy:
    return SelectorProxy(lambda nm, dt, i, n: isinstance(dt, T.StringType))


def time() -> SelectorProxy:
    return SelectorProxy(lambda nm, dt, i, n: False)  # Time maps to long


def exclude(*names: Any) -> SelectorProxy:
    inner = by_name(*[n for n in names if isinstance(n, str)])
    sels = [n for n in names if isinstance(n, SelectorProxy)]
    combined = inner
    for s in sels:
        combined = combined | s
    return ~combined
