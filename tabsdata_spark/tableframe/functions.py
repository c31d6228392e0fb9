"""Top-level expression constructors: td.col / td.lit / concat / when.

Parity: reference tableframe/functions/col.py:56-130, lit.py, and
functions/eager.py:23-115 (concat).
"""

from __future__ import annotations

from typing import Any, Iterable, Sequence

import pyspark.sql.functions as F
import pyspark.sql.types as T

from ..errors import SchemaMismatchError
from .dtypes import to_spark_type
from .expr import Expr


class _ColFactory:
    """`td.col("a")`, `td.col("a", "b")` (multi -> list), `td.col(td.Int64)`
    (dtype selection resolved lazily by selectors)."""

    def __call__(self, *names: Any) -> Expr | list[Expr]:
        resolved: list[Expr] = []
        for n in names:
            if isinstance(n, str):
                resolved.append(
                    Expr(F.col(f"`{n}`") if "." in n else F.col(n), name=n)
                )
            elif isinstance(n, (list, tuple)):
                resolved.extend(self(*n))  # type: ignore[arg-type]
            else:
                # dtype selection -> defer to selectors at bind time
                from .selectors import by_dtype

                resolved.append(by_dtype(n))  # type: ignore[arg-type]
        if len(resolved) == 1:
            return resolved[0]
        return resolved


col = _ColFactory()


def lit(value: Any, dtype: Any | None = None) -> Expr:
    c = F.lit(value)
    if dtype is not None:
        c = c.cast(to_spark_type(dtype))
    return Expr(c)


def concat_str(*exprs: Any, separator: str = "") -> Expr:
    """String concatenation of expressions (Polars td.concat_str).  Note:
    unlike Polars, `+` on string Exprs is numeric here — use this."""
    from .expr import to_column

    cols = [to_column(e) if not isinstance(e, str) else F.col(e) for e in exprs]
    if separator:
        return Expr(F.concat_ws(separator, *cols))
    return Expr(F.concat(*cols))


def when(condition: Any) -> "_WhenThen":
    from .expr import to_column

    return _WhenThen(F.when(to_column(condition), F.lit(None)), to_column(condition))


class _WhenThen:
    """Minimal when/then/otherwise chain (Polars-style)."""

    def __init__(self, _col, cond):
        self._cond = cond

    def then(self, value: Any) -> "_Then":
        from .expr import to_column

        return _Then(F.when(self._cond, to_column(value)))


class _Then(Expr):
    def when(self, condition: Any) -> "_WhenThen2":
        from .expr import to_column

        return _WhenThen2(self._col, to_column(condition))

    def otherwise(self, value: Any) -> Expr:
        from .expr import to_column

        return Expr(self._col.otherwise(to_column(value)))


class _WhenThen2:
    def __init__(self, chain, cond):
        self._chain = chain
        self._cond = cond

    def then(self, value: Any) -> _Then:
        from .expr import to_column

        return _Then(self._chain.when(self._cond, to_column(value)))


class Column:
    """Name+dtype descriptor used for grok/udf output schemas
    (reference: functions/col.py:132)."""

    __slots__ = ("name", "dtype")

    def __init__(self, name: str, dtype: Any = None):
        self.name = name
        self.dtype = to_spark_type(dtype) if dtype is not None else T.StringType()


def concat(frames: Sequence["TableFrame"], how: str = "vertical") -> "TableFrame":  # noqa: F821
    """Row-stack TableFrames (reference functions/eager.py:23-115).

    - vertical: schemas must match exactly -> `UNION ALL`
    - vertical_relaxed: cast to common supertype column-wise, then union
    - diagonal: union by name, missing columns null-filled
    - diagonal_relaxed: diagonal + supertype casts

    All four compile to Spark Union — a zero-shuffle operator that simply
    concatenates partition lists; scale-free.
    """
    from .frame import TableFrame

    frames = list(frames)
    if not frames:
        raise SchemaMismatchError("concat of zero frames")
    dfs = [f._user_df() for f in frames]

    if how == "vertical":
        first_schema = [(fld.name, fld.dataType) for fld in dfs[0].schema.fields]
        for d in dfs[1:]:
            if [(fld.name, fld.dataType) for fld in d.schema.fields] != first_schema:
                raise SchemaMismatchError(
                    "vertical concat requires identical schemas; "
                    "use vertical_relaxed or diagonal"
                )
        out = dfs[0]
        for d in dfs[1:]:
            out = out.union(d)
    elif how == "vertical_relaxed":
        names = dfs[0].columns
        for d in dfs[1:]:
            if d.columns != names:
                raise SchemaMismatchError("vertical_relaxed requires same column names")
        target = _common_schema(dfs, names)
        casted = [
            d.select(*[F.col(f"`{n}`").cast(target[n]).alias(n) for n in names])
            for d in dfs
        ]
        out = casted[0]
        for d in casted[1:]:
            out = out.union(d)
    elif how in ("diagonal", "diagonal_relaxed"):
        all_names: list[str] = []
        for d in dfs:
            for n in d.columns:
                if n not in all_names:
                    all_names.append(n)
        if how == "diagonal_relaxed":
            target = _common_schema(dfs, all_names, missing_ok=True)
            dfs = [
                d.select(
                    *[
                        (F.col(f"`{n}`").cast(target[n]) if n in d.columns
                         else F.lit(None).cast(target[n])).alias(n)
                        for n in all_names
                    ]
                )
                for d in dfs
            ]
            out = dfs[0]
            for d in dfs[1:]:
                out = out.union(d)
        else:
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d, allowMissingColumns=True)
    else:
        raise ValueError(f"unknown concat strategy: {how}")
    return TableFrame._from_df(out, frames[0]._props)


def _common_schema(dfs, names, missing_ok: bool = False) -> dict[str, T.DataType]:
    """Column-wise common supertype across frames (numeric widening chain)."""
    order = [
        T.BooleanType(), T.ByteType(), T.ShortType(), T.IntegerType(),
        T.LongType(), T.FloatType(), T.DoubleType(),
    ]

    def widen(a: T.DataType, b: T.DataType) -> T.DataType:
        if a == b:
            return a
        if a in order and b in order:
            return order[max(order.index(a), order.index(b))]
        if T.StringType() in (a, b):
            return T.StringType()
        if isinstance(a, T.NullType):
            return b
        if isinstance(b, T.NullType):
            return a
        return T.StringType()

    out: dict[str, T.DataType] = {}
    for n in names:
        t: T.DataType | None = None
        for d in dfs:
            if n not in d.columns:
                if not missing_ok:
                    raise SchemaMismatchError(f"column {n} missing in concat input")
                continue
            dt = d.schema[n].dataType
            t = dt if t is None else widen(t, dt)
        out[n] = t or T.NullType()
    return out
