"""Data-quality namespace (reference tableframe/dq/engine.py:22-316).

Fluent checks appending Boolean columns with managed `_dq`-postfix naming
(engine.py:55-84).  Each check is a single JVM predicate column — zero
Python in the hot path; the `fn` escape hatch uses an Arrow-batched pandas
UDF like the reference's map_batches path (engine.py:281-316).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import pyspark.sql.functions as F
import pyspark.sql.types as T

from .expr import Expr, to_column


class DQEngine:
    def __init__(self, frame):
        self._frame = frame

    def _name(self, column: str, check: str, name: str | None) -> str:
        return name or f"{column}_{check}_dq"

    def _add(self, out_name: str, col) -> "TableFrame":  # noqa: F821
        return self._frame.with_columns(**{out_name: Expr(col)})

    def _c(self, column: str):
        return F.col(f"`{column}`")

    def is_null(self, column: str, name: str | None = None):
        return self._add(self._name(column, "is_null", name), self._c(column).isNull())

    def is_not_null(self, column: str, name: str | None = None):
        return self._add(self._name(column, "is_not_null", name), self._c(column).isNotNull())

    def is_nan(self, column: str, name: str | None = None):
        return self._add(self._name(column, "is_nan", name), F.isnan(self._c(column)))

    def is_not_nan(self, column: str, name: str | None = None):
        return self._add(self._name(column, "is_not_nan", name), ~F.isnan(self._c(column)))

    def is_null_or_nan(self, column: str, name: str | None = None):
        c = self._c(column)
        return self._add(self._name(column, "is_null_or_nan", name), c.isNull() | F.isnan(c))

    def is_not_null_or_nan(self, column: str, name: str | None = None):
        c = self._c(column)
        return self._add(self._name(column, "is_not_null_or_nan", name), c.isNotNull() & ~F.isnan(c))

    def is_in(self, column: str, values: Sequence[Any], name: str | None = None):
        return self._add(self._name(column, "is_in", name), self._c(column).isin(list(values)))

    def is_not_in(self, column: str, values: Sequence[Any], name: str | None = None):
        return self._add(self._name(column, "is_not_in", name), ~self._c(column).isin(list(values)))

    def is_positive(self, column: str, name: str | None = None):
        return self._add(self._name(column, "is_positive", name), self._c(column) > 0)

    def is_positive_or_zero(self, column: str, name: str | None = None):
        return self._add(self._name(column, "is_positive_or_zero", name), self._c(column) >= 0)

    def is_negative(self, column: str, name: str | None = None):
        return self._add(self._name(column, "is_negative", name), self._c(column) < 0)

    def is_negative_or_zero(self, column: str, name: str | None = None):
        return self._add(self._name(column, "is_negative_or_zero", name), self._c(column) <= 0)

    def is_zero(self, column: str, name: str | None = None):
        return self._add(self._name(column, "is_zero", name), self._c(column) == 0)

    def is_between(self, column: str, lower: Any, upper: Any, name: str | None = None):
        c = self._c(column)
        return self._add(self._name(column, "is_between", name), (c >= lower) & (c <= upper))

    def is_not_between(self, column: str, lower: Any, upper: Any, name: str | None = None):
        c = self._c(column)
        return self._add(self._name(column, "is_not_between", name), (c < lower) | (c > upper))

    def expr(self, expression: Any, name: str):
        return self._add(name, to_column(expression).cast("boolean"))

    def fn(self, columns: str | Sequence[str], function: Callable, name: str,
           mode: str = "row"):
        """Custom check over selected columns (engine.py:281-316).
        mode='row': function(values...) -> bool per row.
        mode='batch': function(pandas.Series...) -> boolean Series."""
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        cols = [columns] if isinstance(columns, str) else list(columns)

        if mode == "batch":
            def run(*series):
                return pd.Series(function(*series), dtype="boolean")
        else:
            def run(*series):
                return pd.Series(
                    [function(*vals) for vals in zip(*series)], dtype="boolean"
                )

        # pandas_udf rejects *varargs signatures: generate fixed arity
        argnames = [f"s{i}" for i in range(len(cols))]
        src = (f"def _fixed({', '.join(a + ': pd.Series' for a in argnames)})"
               f" -> pd.Series:\n    return run({', '.join(argnames)})\n")
        ns = {"run": run, "pd": pd}
        exec(src, ns)
        check = pandas_udf(ns["_fixed"], T.BooleanType())

        return self._add(name, check(*[self._c(c) for c in cols]))
