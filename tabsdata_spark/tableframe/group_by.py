"""Group-by surface (reference tableframe/lazyframe/group_by.py:34-576).

System columns are dropped from aggregate output and re-created lazily on
store — the open-source reference behavior (group_by.py:140-144).  All
aggregations compile to Spark HashAggregate with map-side partial
aggregation; the shuffle moves only one row per (partition, group), which is
the optimal distributed plan at any scale.
"""

from __future__ import annotations

from typing import Any, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column

from .expr import Expr, to_column


class TableFrameGroupBy:
    def __init__(self, frame, keys: Sequence[Column],
                 key_names: Sequence[str | None] = ()):
        self._frame = frame
        self._keys = list(keys)
        # best-effort JVM-free output names of the group keys (None where
        # unknowable without analysis) — used by agg()'s duplicate check
        self._key_names = [n for n in key_names if n is not None]

    def _g(self):
        return self._frame._user_df().groupBy(*self._keys)

    def _wrap(self, df):
        from .frame import TableFrame

        return TableFrame._from_df(df, self._frame._props)

    def agg(self, *exprs: Any, **named: Any) -> "TableFrame":  # noqa: F821
        from ..errors import DuplicateColumnError
        from .expr import Expr

        cols: list[Column] = []
        names: list[str | None] = []

        def add(e: Any) -> None:
            cols.append(to_column(e))
            names.append(e._name if isinstance(e, Expr) else None)

        for e in exprs:
            if isinstance(e, (list, tuple)):
                for x in e:
                    add(x)
            else:
                add(e)
        for name, e in named.items():
            cols.append(to_column(e).alias(name))
            names.append(name)
        known = [n for n in names if n is not None]
        dupes = sorted({n for n in known if known.count(n) > 1})
        # an agg output aliased to a GROUP KEY name also duplicates —
        # Polars raises DuplicateError for both classes
        dupes += sorted(set(known) & set(self._key_names))
        if dupes:
            raise DuplicateColumnError(f"agg would duplicate: {sorted(set(dupes))}")
        if not cols:
            return self.len()
        return self._wrap(self._g().agg(*cols))

    def len(self, name: str = "len") -> "TableFrame":  # noqa: F821
        return self._wrap(self._g().agg(F.count(F.lit(1)).alias(name)))

    def count(self) -> "TableFrame":  # noqa: F821
        return self.len(name="count")

    def _all_cols(self) -> list[str]:
        key_names = {self._frame._user_df().select(k).columns[0] for k in self._keys}
        return [c for c in self._frame.columns if c not in key_names]

    def _apply_all(self, fn, suffix: str = "") -> "TableFrame":  # noqa: F821
        aggs = [fn(F.col(f"`{c}`")).alias(c + suffix) for c in self._all_cols()]
        return self._wrap(self._g().agg(*aggs))

    def max(self) -> "TableFrame":  # noqa: F821
        return self._apply_all(F.max)

    def min(self) -> "TableFrame":  # noqa: F821
        return self._apply_all(F.min)

    def sum(self) -> "TableFrame":  # noqa: F821
        return self._apply_all(F.sum)

    def mean(self) -> "TableFrame":  # noqa: F821
        return self._apply_all(F.avg)

    def median(self) -> "TableFrame":  # noqa: F821
        return self._apply_all(F.median)

    def n_unique(self) -> "TableFrame":  # noqa: F821
        # Same formulation as Expr.n_unique: Polars counts null as a
        # distinct value, count_distinct alone ignores it — plain
        # count_distinct would be off by one for groups containing nulls.
        return self._apply_all(
            lambda c: F.count_distinct(c)
            + F.max(F.when(c.isNull(), 1).otherwise(0))
        )
