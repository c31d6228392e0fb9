"""UDF authoring surface (reference tableframe/udf/function.py:67-530 and
TableFrame.udf, frame.py:1241-1441).

Reference mechanics: pack selected expressions into a struct, run Polars
map_batches, unnest declared output columns.  Spark-first translation: an
Arrow-batched pandas_udf returning a struct, then `select("out.*")` — the
exact same pack/compute/unnest shape, with Arrow doing the (only) Python
boundary crossing in vectorized batches.  N-in/N-out supported; `on_batch`
is the vectorized path, `on_element` the row-wise convenience (still batched
over Arrow, rows iterated in Python — 10-100x slower, same as the
reference's elementwise mode).
"""

from __future__ import annotations

from typing import Any, Sequence

import pyspark.sql.functions as F
import pyspark.sql.types as T

from ..errors import ReservedColumnError
from .dtypes import to_spark_type
from .functions import Column as ColumnSpec


class UDF:
    """Subclass and declare `output_columns`; implement `on_batch` (series in,
    series out) or `on_element` (values in, values out).  Signature style
    'list' passes one list argument; 'unpacked' passes *args
    (function.py:153-165)."""

    output_columns: Sequence[Any] = ()
    signature: str = "unpacked"

    def on_batch(self, *series):  # pragma: no cover - abstract
        raise NotImplementedError

    def on_element(self, *values):  # pragma: no cover - abstract
        raise NotImplementedError

    def _normalized_outputs(self) -> list[tuple[str, T.DataType]]:
        out: list[tuple[str, T.DataType]] = []
        for c in self.output_columns:
            if isinstance(c, ColumnSpec):
                out.append((c.name, c.dtype))
            elif isinstance(c, tuple):
                out.append((c[0], to_spark_type(c[1])))
            elif isinstance(c, str):
                out.append((c, T.StringType()))
            else:
                raise TypeError(f"bad output column spec: {c!r}")
        for name, _ in out:
            if name.startswith("$td."):
                raise ReservedColumnError(name)
        return out

    def _has_batch(self) -> bool:
        return type(self).on_batch is not UDF.on_batch


class UDFList(UDF):
    signature = "list"


class UDFUnpacked(UDF):
    signature = "unpacked"


def apply_udf(frame, on: Any, function: UDF):
    """TableFrame.udf: run `function` over the `on` expressions, appending
    its declared output columns."""
    import pandas as pd

    if not isinstance(function, UDF):
        raise TypeError(
            "TableFrame.udf expects a UDF instance (subclass UDF/UDFList/"
            f"UDFUnpacked and declare output_columns); got {type(function).__name__}"
        )
    outputs = function._normalized_outputs()
    ret_type = T.StructType([T.StructField(n, t) for n, t in outputs])
    in_cols = frame._resolve(on if isinstance(on, (list, tuple)) else [on])
    out_names = [n for n, _ in outputs]

    use_batch = function._has_batch()
    as_list = function.signature == "list"

    def _run(*series):
        if use_batch:
            res = function.on_batch(list(series)) if as_list else function.on_batch(*series)
        else:
            rows = []
            for vals in zip(*series):
                r = function.on_element(list(vals)) if as_list else function.on_element(*vals)
                rows.append(r if isinstance(r, (list, tuple)) else [r])
            res = list(zip(*rows)) if rows else [[] for _ in out_names]
        data = {}
        for name, col in zip(out_names, res):
            data[name] = col if isinstance(col, pd.Series) else pd.Series(list(col))
        df = pd.DataFrame(data)
        if df.empty:
            df = pd.DataFrame({n: pd.Series(dtype="object") for n in out_names})
        return df

    # pandas_udf type-hint inference rejects *varargs; generate a fixed-arity
    # wrapper matching the number of input columns
    n_in = len(in_cols)
    argnames = [f"s{i}" for i in range(n_in)]
    src = f"def _fixed({', '.join(a + ': pd.Series' for a in argnames)}) -> pd.DataFrame:\n"
    src += f"    return _run({', '.join(argnames)})\n"
    ns = {"_run": _run, "pd": pd}
    exec(src, ns)
    _udf = F.pandas_udf(ns["_fixed"], ret_type)

    packed = _udf(*in_cols)
    out = frame._df.withColumn("__td_udf", packed)
    sel = [F.col(f"`{c}`") for c in out.columns if c != "__td_udf"
           and c not in out_names]
    sel += [F.col("__td_udf").getField(n).alias(n) for n in out_names]
    result = out.select(*sel)
    # keep user columns first, system columns last
    from . import _system as S

    ordered = S.user_columns(result) + S.system_columns_present(result)
    return frame._rebuild(result.select(*[F.col(f"`{c}`") for c in ordered]))
