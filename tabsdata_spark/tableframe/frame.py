"""TableFrame: the user-facing lazy table handle, backed by a Spark DataFrame.

Parity target: reference client/td-sdk/tabsdata/tableframe/lazyframe/frame.py
(TableFrame over a Polars LazyFrame).  Here the lazy plan IS the Catalyst
logical plan — every method below is a pure plan transformation; nothing
executes until the runner writes a table version (or an explicit
materializer like `first_row` is called).

Scale notes (local[32] today, 1000 executors tomorrow):
- No method ever calls collect() except the explicitly-materializing ones
  the reference also materializes (`first_row/last_row/item/extract_*`).
- Ordering is *logical*: `sort()` records its keys, and downstream
  order-dependent ops (head/tail/slice/unique keep=first|last/diff) reuse
  them as window order — Spark has no stable physical row order, so this is
  the only scale-sound way to honor Polars' row-order semantics
  (SURVEY §7 "hard parts").
- Window-with-no-partition ops (global slice) are documented hot spots; all
  other ops shuffle by key and scale linearly.
"""

from __future__ import annotations

from typing import Any, Iterable, Mapping, Sequence

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.window import Window

from ..errors import (
    DuplicateColumnError,
    MissingColumnError,
    ReservedColumnError,
    SchemaMismatchError,
    ShapeError,
)
from . import _system as S
from .dtypes import to_spark_type
from .expr import Expr, to_column


def _q(name: str) -> Column:
    return F.col(f"`{name}`")


class TableFrame:
    """Lazy table handle (reference frame.py:108)."""

    def __init__(self, *, _df: DataFrame, _props: S.FrameProperties | None = None,
                 _sort: list[tuple[Column, bool, bool]] | None = None):
        self._df = _df
        self._props = _props or S.FrameProperties.fresh()
        # logical order: [(key, descending, nulls_last)] from last sort()
        self._sort_cols = _sort

    def _order_exprs(self, reverse: bool = False) -> list[Column]:
        keys = self._sort_cols or [(F.monotonically_increasing_id(), False, False)]
        out = []
        for k, d, nl in keys:
            if reverse:
                d, nl = not d, not nl
            if d:
                out.append(k.desc_nulls_last() if nl else k.desc_nulls_first())
            else:
                out.append(k.asc_nulls_last() if nl else k.asc_nulls_first())
        return out

    # ------------------------------------------------------------------
    # constructors (reference frame.py:128-269)
    # ------------------------------------------------------------------
    @classmethod
    def _from_df(cls, df: DataFrame, props: S.FrameProperties | None = None,
                 sort: list[Column] | None = None) -> "TableFrame":
        for c in S.user_columns(df):
            if c.startswith(S.TD_PREFIX):  # pragma: no cover - defensive
                raise ReservedColumnError(c)
        return cls(_df=df, _props=props, _sort=sort)

    @classmethod
    def from_spark(cls, df: DataFrame) -> "TableFrame":
        bad = [c for c in df.columns if S.is_system_column(c)
               and c not in S.SYSTEM_COLUMNS]
        if bad:
            raise ReservedColumnError(", ".join(bad))
        return cls._from_df(df)

    @classmethod
    def from_dict(cls, spark: SparkSession, data: Mapping[str, Sequence[Any]]) -> "TableFrame":
        import pandas as pd

        return cls.from_pandas(spark, pd.DataFrame(dict(data)))

    @classmethod
    def from_pandas(cls, spark: SparkSession, pdf) -> "TableFrame":
        for c in pdf.columns:
            if S.is_system_column(str(c)):
                raise ReservedColumnError(str(c))
        return cls._from_df(spark.createDataFrame(pdf))

    @classmethod
    def empty(cls, spark: SparkSession, schema: Mapping[str, Any] | None = None) -> "TableFrame":
        fields = [
            T.StructField(n, to_spark_type(t)) for n, t in (schema or {}).items()
        ]
        return cls._from_df(spark.createDataFrame([], T.StructType(fields)))

    # exports
    def to_spark(self) -> DataFrame:
        return self._user_df()

    #: alias used throughout queries()/tests
    @property
    def df(self) -> DataFrame:
        return self._user_df()

    def to_pandas(self):
        return self._user_df().toPandas()

    def to_dict(self) -> dict[str, list]:
        # collect(), not toPandas(): pandas would coerce int-with-null to
        # float and null to NaN, losing the Polars-parity null distinction
        cols = self.columns
        rows = self._user_df().collect()
        return {c: [r[i] for r in rows] for i, c in enumerate(cols)}

    def _user_df(self) -> DataFrame:
        sys_cols = S.system_columns_present(self._df)
        return self._df.drop(*sys_cols) if sys_cols else self._df

    # ------------------------------------------------------------------
    # schema introspection (frame.py:405-431,699-778,597-661)
    # ------------------------------------------------------------------
    @property
    def columns(self) -> list[str]:
        return S.user_columns(self._df)

    @property
    def dtypes(self) -> list[T.DataType]:
        return [f.dataType for f in self._df.schema.fields
                if not S.is_system_column(f.name)]

    @property
    def schema(self) -> dict[str, T.DataType]:
        return {f.name: f.dataType for f in self._df.schema.fields
                if not S.is_system_column(f.name)}

    @property
    def width(self) -> int:
        return len(self.columns)

    def has_cols(self, cols: str | Iterable[str]) -> bool:
        want = {cols} if isinstance(cols, str) else set(cols)
        return want.issubset(set(self.columns))

    def assert_has_cols(self, cols: str | Iterable[str]) -> None:
        want = [cols] if isinstance(cols, str) else list(cols)
        missing = [c for c in want if c not in self.columns]
        if missing:
            raise MissingColumnError(f"missing columns: {missing}")

    def has_same_schema(self, other: "TableFrame") -> bool:
        mine = sorted((f.name, f.dataType.simpleString())
                      for f in self._df.schema.fields
                      if not S.is_system_column(f.name))
        theirs = sorted((f.name, f.dataType.simpleString())
                        for f in other._df.schema.fields
                        if not S.is_system_column(f.name))
        return mine == theirs

    def is_empty(self) -> bool:
        return self._df.isEmpty()

    def explain(self, mode: str = "formatted") -> None:
        self._user_df().explain(mode)

    def show_graph(self) -> str:
        try:
            plan = self._user_df()._jdf.queryExecution().optimizedPlan().toString()
        except Exception:
            # Spark Connect: no py4j _jdf handle — the extended explain
            # string carries the optimized plan section instead.
            plan = self._user_df()._explain_string(extended=True)
        print(plan)
        return plan

    def inspect(self, prefix: str = "") -> "TableFrame":
        print(f"{prefix}TableFrame(columns={self.columns})")
        return self

    # ------------------------------------------------------------------
    # expression resolution helpers
    # ------------------------------------------------------------------
    def _resolve(self, e: Any) -> list[Column]:
        """str | Expr | selector | Column | literal -> concrete Columns."""
        from .selectors import SelectorProxy

        if isinstance(e, str):
            if e == "*":
                return [_q(c) for c in self.columns]
            if e.startswith(S.READABLE_PREFIX) and e not in self._df.columns:
                return [S.virtual_column(self._props, e).alias(e)]
            return [_q(e)]
        if isinstance(e, SelectorProxy):
            return [_q(c) for c in e._resolve(self.schema)]
        if isinstance(e, Expr):
            return [e._col]
        if isinstance(e, Column):
            return [e]
        if isinstance(e, (list, tuple)):
            out: list[Column] = []
            for x in e:
                out.extend(self._resolve(x))
            return out
        return [F.lit(e)]

    def _resolve_many(self, exprs: Sequence[Any], named: Mapping[str, Any]) -> list[Column]:
        return self._resolve_many_named(exprs, named)[0]

    def _resolve_many_named(
        self, exprs: Sequence[Any], named: Mapping[str, Any]
    ) -> tuple[list[Column], list[str | None]]:
        """Resolve expressions plus their best-effort OUTPUT names (None when
        unknowable without analysis) — keeps duplicate-output detection
        JVM-free: forcing .columns here would analyze the whole upstream
        plan once per chained select."""
        cols: list[Column] = []
        names: list[str | None] = []

        def known_name(e: Any) -> str | None:
            if isinstance(e, str):
                return e
            if isinstance(e, Expr):
                return e._name
            return None

        from .selectors import SelectorProxy

        for e in exprs:
            if isinstance(e, str) and e == "*":
                cols.extend(self._resolve(e))
                names.extend(self.columns)
            elif isinstance(e, SelectorProxy):
                resolved_names = e._resolve(self.schema)
                cols.extend(_q(c) for c in resolved_names)
                names.extend(resolved_names)
            elif isinstance(e, (list, tuple)):
                sub_c, sub_n = self._resolve_many_named(e, {})
                cols.extend(sub_c)
                names.extend(sub_n)
            else:
                resolved = self._resolve(e)
                cols.extend(resolved)
                names.extend([known_name(e)] + [None] * (len(resolved) - 1))
        for name, e in named.items():
            if S.is_system_column(name):
                raise ReservedColumnError(name)
            resolved = self._resolve(e)
            if len(resolved) != 1:
                raise SchemaMismatchError(f"named expr {name} resolved to {len(resolved)} columns")
            cols.append(resolved[0].alias(name))
            names.append(name)
        return cols, names

    def _rebuild(self, df: DataFrame, keep_sort: bool = False) -> "TableFrame":
        return TableFrame(_df=df, _props=self._props,
                          _sort=self._sort_cols if keep_sort else None)

    def _with_system(self, user_cols: list[Column]) -> list[Column]:
        return user_cols + [_q(c) for c in S.system_columns_present(self._df)]

    # ------------------------------------------------------------------
    # projections / row ops (SURVEY §2.2)
    # ------------------------------------------------------------------
    def select(self, *exprs: Any, **named: Any) -> "TableFrame":
        cols, names = self._resolve_many_named(exprs, named)
        known = [n for n in names if n is not None]
        dupes = sorted({n for n in known if known.count(n) > 1})
        if dupes:
            raise DuplicateColumnError(f"select would duplicate: {dupes}")
        return self._rebuild(self._df.select(*self._with_system(cols)))

    def with_columns(self, *exprs: Any, **named: Any) -> "TableFrame":
        """Add/replace columns.  ALL expressions evaluate against the input
        frame (Polars with_columns semantics — one projection, not a
        sequential withColumn chain), so one expression cannot reference a
        column introduced by another in the same call."""
        cols, names = self._resolve_many_named(exprs, named)
        mapping: dict[str, Column] = {}
        for c, n in zip(cols, names):
            # known names (td.col / .alias / named kwargs) skip the
            # analysis round-trip _col_name costs per expression
            name = n if n is not None else _col_name(self._df, c)
            if S.is_system_column(name):
                raise ReservedColumnError(name)
            if name in mapping:
                raise DuplicateColumnError(f"with_columns: {name}")
            mapping[name] = c
        return self._rebuild(self._df.withColumns(mapping), keep_sort=True)

    def filter(self, *predicates: Any) -> "TableFrame":
        cond: Column | None = None
        for p in predicates:
            pc = to_column(p) if not isinstance(p, str) else _q(p)
            cond = pc if cond is None else (cond & pc)
        if cond is None:
            return self
        return self._rebuild(self._df.filter(cond), keep_sort=True)

    def drop(self, *columns: Any, strict: bool = True) -> "TableFrame":
        from .selectors import SelectorProxy

        names: list[str] = []
        for c in columns:
            if isinstance(c, SelectorProxy):
                names.extend(c._resolve(self.schema))
            elif isinstance(c, (list, tuple)):
                names.extend(c)
            else:
                names.append(c)
        if strict:
            missing = [n for n in names if n not in self.columns]
            if missing:
                raise MissingColumnError(f"drop: {missing}")
        return self._rebuild(self._df.drop(*names), keep_sort=True)

    def rename(self, mapping: Mapping[str, str], strict: bool = True) -> "TableFrame":
        if strict:
            missing = [k for k in mapping if k not in self.columns]
            if missing:
                raise MissingColumnError(f"rename: {missing}")
        for v in mapping.values():
            if S.is_system_column(v):
                raise ReservedColumnError(v)
        # Atomic: all renames apply simultaneously (Polars semantics —
        # reference rename delegates to pl.LazyFrame.rename,
        # lazyframe/frame.py:1445), so swaps like {"a": "b", "b": "a"} work.
        # Sequential withColumnRenamed would alias-collide mid-sequence and
        # silently merge/drop columns.
        new_names = [mapping.get(c, c) for c in self._df.columns]
        dupes = sorted({n for n in new_names if new_names.count(n) > 1})
        if dupes:
            raise DuplicateColumnError(f"rename would duplicate: {dupes}")
        out = self._df.select(
            *[_q(c).alias(n) for c, n in zip(self._df.columns, new_names)]
        )
        return self._rebuild(out, keep_sort=True)

    def cast(self, dtypes: Mapping[Any, Any] | Any, strict: bool = False) -> "TableFrame":
        """Per-column or per-dtype-class cast (frame.py:896).  strict=True
        raises on bad values (ANSI cast); else bad values -> null."""
        if not isinstance(dtypes, Mapping):
            dtypes = {c: dtypes for c in self.columns}
        plan: dict[str, T.DataType] = {}
        for key, target in dtypes.items():
            tgt = to_spark_type(target)
            if isinstance(key, str):
                if key not in self.columns:
                    raise MissingColumnError(f"cast: {key}")
                plan[key] = tgt
            else:
                src = to_spark_type(key)
                for c, dt in self.schema.items():
                    if dt == src:
                        plan[c] = tgt
        out = self._df
        for c, tgt in plan.items():
            # route through Expr.cast: legacy null-on-error fast path for
            # non-strict, raise_error guard for strict (see expr.py)
            out = out.withColumn(c, Expr(_q(c)).cast(tgt, strict=strict)._col)
        return self._rebuild(out, keep_sort=True)

    def unnest(self, columns: str | Sequence[str]) -> "TableFrame":
        """Struct column -> one column per field, in place (frame.py:1579)."""
        targets = [columns] if isinstance(columns, str) else list(columns)
        missing = [c for c in targets if c not in self._df.columns]
        if missing:
            raise MissingColumnError(f"unnest: {missing}")
        for c in targets:
            if not isinstance(self._df.schema[c].dataType, T.StructType):
                raise SchemaMismatchError(
                    f"unnest: column {c!r} is "
                    f"{self._df.schema[c].dataType.simpleString()}, not struct"
                )
        sel: list[Column] = []
        for c in self._df.columns:
            if c in targets:
                for fld in self._df.schema[c].dataType.fieldNames():
                    sel.append(_q(c).getField(fld).alias(fld))
            else:
                sel.append(_q(c))
        return self._rebuild(self._df.select(*sel), keep_sort=True)

    def fill_null(self, value: Any) -> "TableFrame":
        sel = [
            F.coalesce(_q(c), to_column(value)).alias(c) for c in self.columns
        ]
        return self._rebuild(self._df.select(*self._with_system(sel)), keep_sort=True)

    def fill_nan(self, value: Any) -> "TableFrame":
        sel = []
        for c, dt in self.schema.items():
            if isinstance(dt, (T.FloatType, T.DoubleType)):
                sel.append(
                    F.when(F.isnan(_q(c)), to_column(value)).otherwise(_q(c)).alias(c)
                )
            else:
                sel.append(_q(c))
        return self._rebuild(self._df.select(*self._with_system(sel)), keep_sort=True)

    def drop_nulls(self, subset: str | Sequence[str] | None = None) -> "TableFrame":
        # explicit isNotNull filters, NOT na.drop: Spark's na.drop also
        # removes NaN, but Polars drop_nulls keeps NaN (SURVEY §7 null/NaN)
        cols = [subset] if isinstance(subset, str) else (list(subset) if subset else self.columns)
        out = self._df
        for c in cols:
            out = out.filter(_q(c).isNotNull())
        return self._rebuild(out, keep_sort=True)

    def drop_nans(self, subset: str | Sequence[str] | None = None) -> "TableFrame":
        cols = [subset] if isinstance(subset, str) else (list(subset) if subset else None)
        if cols is None:
            cols = [c for c, dt in self.schema.items()
                    if isinstance(dt, (T.FloatType, T.DoubleType))]
        out = self._df
        for c in cols:
            out = out.filter(~F.isnan(_q(c)) | _q(c).isNull())
        return self._rebuild(out, keep_sort=True)

    def unique(self, subset: str | Sequence[str] | None = None,
               keep: str = "any", maintain_order: bool = False) -> "TableFrame":
        """Dedup (frame.py:1764).  keep=any -> dropDuplicates (map-side
        partial dedup, the scale-optimal path).  keep=first/last honor the
        frame's logical sort order via a window; keep=none keeps only
        singletons."""
        if keep not in ("any", "first", "last", "none"):
            raise ValueError(
                f"unique: keep must be one of 'first', 'last', 'any', 'none';"
                f" got {keep!r}"
            )
        cols = [subset] if isinstance(subset, str) else (list(subset) if subset else self.columns)
        if keep == "any":
            out = self._df.dropDuplicates(cols)
            return self._rebuild(out)
        part = [_q(c) for c in cols]
        if keep == "none":
            w = Window.partitionBy(*part)
            out = (self._df.withColumn("__td_cnt", F.count(F.lit(1)).over(w))
                   .filter(F.col("__td_cnt") == 1).drop("__td_cnt"))
            return self._rebuild(out)
        order = self._order_exprs(reverse=(keep == "last"))
        w = Window.partitionBy(*part).orderBy(*order)
        out = (self._df.withColumn("__td_rn", F.row_number().over(w))
               .filter(F.col("__td_rn") == 1).drop("__td_rn"))
        return self._rebuild(out, keep_sort=True)

    # ------------------------------------------------------------------
    # ordering & slicing
    # ------------------------------------------------------------------
    def sort(self, by: Any, *more_by: Any, descending: bool | Sequence[bool] = False,
             nulls_last: bool | Sequence[bool] = False,
             maintain_order: bool = False) -> "TableFrame":
        keys = self._resolve(by)
        for b in more_by:
            keys.extend(self._resolve(b))
        n = len(keys)
        desc = [descending] * n if isinstance(descending, bool) else list(descending)
        nl = [nulls_last] * n if isinstance(nulls_last, bool) else list(nulls_last)
        if len(desc) != n:
            raise ValueError(
                f"sort: length of descending ({len(desc)}) does not match"
                f" the number of sort keys ({n})"
            )
        if len(nl) != n:
            raise ValueError(
                f"sort: length of nulls_last ({len(nl)}) does not match"
                f" the number of sort keys ({n})"
            )
        sort_spec = list(zip(keys, desc, nl))
        out = TableFrame(_df=self._df, _props=self._props, _sort=sort_spec)
        out._df = self._df.orderBy(*out._order_exprs())
        return out

    def slice(self, offset: int, length: int | None = None) -> "TableFrame":
        """Positional slice (frame.py:2195).  offset=0 folds to limit()
        (distributed); general offsets need a global row_number — inherently
        a global operation, same as any OFFSET pagination at scale.

        Negative offsets count from the end with Python-slice clamping
        (polars slice_offsets: start = N + offset, end = start + length,
        both clamped to [0, N]); negative lengths raise, matching
        pl.LazyFrame.slice."""
        if length is not None and length < 0:
            raise ValueError(
                f"negative slice lengths ({length}) are invalid"
            )
        if offset == 0 and length is not None:
            return self.limit(length)
        if offset >= 0:
            w = Window.orderBy(*self._order_exprs())
            out = self._df.withColumn("__td_rn", F.row_number().over(w))
            hi = None if length is None else offset + length
            cond = F.col("__td_rn") > offset
            if hi is not None:
                cond = cond & (F.col("__td_rn") <= hi)
            return self._rebuild(out.filter(cond).drop("__td_rn"),
                                 keep_sort=True)
        if length is None:
            # last |offset| rows — TakeOrderedAndProject, no global window
            return self.tail(-offset)
        # negative offset with a length: start/end are N-relative, so the
        # filter needs the 0-based index AND the total row count; both come
        # from the same single global window (this is the documented
        # whole-column positional hot spot, bounded like slice/tail).
        w = Window.orderBy(*self._order_exprs())
        wall = w.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
        out = (self._df
               .withColumn("__td_rn", F.row_number().over(w))
               .withColumn("__td_n", F.count(F.lit(1)).over(wall)))
        idx0 = F.col("__td_rn") - 1
        start_raw = F.col("__td_n") + F.lit(offset)
        end_raw = start_raw + F.lit(length)
        cond = (idx0 >= F.greatest(start_raw, F.lit(0))) & \
               (idx0 < F.least(end_raw, F.col("__td_n")))
        return self._rebuild(out.filter(cond).drop("__td_rn", "__td_n"),
                             keep_sort=True)

    def limit(self, n: int) -> "TableFrame":
        if n < 0:
            raise ValueError(f"negative slice lengths ({n}) are invalid")
        return self._rebuild(self._df.limit(n), keep_sort=True)

    def head(self, n: int = 5) -> "TableFrame":
        return self.limit(n)

    def tail(self, n: int = 5) -> "TableFrame":
        """Last n under the frame's logical order: reverse-sort, limit, and
        restore order — compiles to TakeOrderedAndProject twice, no global
        window."""
        if n < 0:
            raise ValueError(f"negative slice lengths ({n}) are invalid")
        out = self._df.orderBy(*self._order_exprs(reverse=True)).limit(n)
        if self._sort_cols:
            out = out.orderBy(*self._order_exprs())
        return self._rebuild(out, keep_sort=True)

    def first(self) -> "TableFrame":
        return self.limit(1)

    def last(self) -> "TableFrame":
        return self.tail(1)

    def first_row(self, named: bool = False):
        row = self._user_df().first()
        if row is None:
            raise ShapeError("first_row on empty frame")
        return row.asDict() if named else tuple(row)

    def last_row(self, named: bool = False):
        rows = self.tail(1)._user_df().collect()
        if not rows:
            raise ShapeError("last_row on empty frame")
        return rows[0].asDict() if named else tuple(rows[0])

    def item(self, row: int | None = None, column: str | None = None):
        df = self._user_df()
        if column is not None:
            df = df.select(_q(column))
        if df.schema.fields and len(df.schema.fields) != 1:
            raise ShapeError("item() requires exactly one column")
        if row is not None:
            if row < 0:
                # negative indexing from the end (Python/Polars item
                # semantics): reverse-order limit gives rows N-1..N+row in
                # that order, so the target (index N+row) is the last one
                sel = df.columns[0] if column is None else column
                vals = (self._user_df()
                        .orderBy(*self._order_exprs(reverse=True))
                        .limit(-row).select(_q(sel)).collect())
                if len(vals) < -row:
                    raise ShapeError(f"item(): row {row} out of range")
                return vals[-1][0]
            vals = df.limit(row + 1).collect()
            if len(vals) <= row:
                raise ShapeError(f"item(): row {row} out of range")
            return vals[row][0]
        vals = df.limit(2).collect()
        if len(vals) != 1:
            raise ShapeError("item() requires exactly one row")
        return vals[0][0]

    def extract_as_rows(self, n: int = 1, offset: int = 0) -> list[dict]:
        rows = self.slice(offset, n)._user_df().collect()
        return [r.asDict() for r in rows]

    def extract_as_columns(self, n: int = 1, offset: int = 0) -> dict[str, list]:
        rows = self.extract_as_rows(n, offset)
        if not rows:
            return {c: [] for c in self.columns}
        return {c: [r[c] for r in rows] for c in rows[0]}

    def clear(self) -> "TableFrame":
        return self._rebuild(self._df.limit(0))

    # ------------------------------------------------------------------
    # relational ops
    # ------------------------------------------------------------------
    def group_by(self, *by: Any, **named_by: Any) -> "TableFrameGroupBy":
        from .group_by import TableFrameGroupBy

        keys, key_names = self._resolve_many_named(by, named_by)
        return TableFrameGroupBy(self, keys, key_names)

    def join(self, other: "TableFrame", on: Any = None, how: str = "inner", *,
             left_on: Any = None, right_on: Any = None, suffix: str = "_right",
             join_nulls: bool = False, coalesce: bool | None = None) -> "TableFrame":
        """Equi-join (frame.py:1017-1173).  Catalyst picks broadcast /
        shuffled-hash / sort-merge; AQE upgrades to broadcast at runtime when
        the post-filter side is small.  join_nulls=True -> `<=>` predicates.
        Right-side system columns are discarded (reference
        assemble_system_columns, extension.py:174-180)."""
        how_map = {
            "inner": "inner", "left": "left", "right": "right", "full": "full",
            "outer": "full", "semi": "left_semi", "anti": "left_anti",
            "cross": "cross",
        }
        if how not in how_map:
            raise ValueError(f"unknown join strategy {how}")
        spark_how = how_map[how]
        ldf = self._df
        rdf = other._user_df()  # right system columns dropped

        if how == "cross":
            if on is not None or left_on is not None or right_on is not None:
                raise ValueError("cross join should not pass join keys")
            rsel = [_q(c).alias(c + suffix if c in ldf.columns else c)
                    for c in rdf.columns]
            return self._rebuild(ldf.crossJoin(rdf.select(*rsel)))

        if on is not None:
            if left_on is not None or right_on is not None:
                raise ValueError(
                    "join: cannot use 'on' together with 'left_on'/'right_on'"
                )
            lkeys = [on] if isinstance(on, str) else list(on)
            rkeys = lkeys
            using = True
        else:
            if left_on is None or right_on is None:
                raise ValueError(
                    f"join: how={how!r} requires 'on' or both"
                    " 'left_on' and 'right_on'"
                )
            lkeys = [left_on] if isinstance(left_on, str) else list(left_on)
            rkeys = [right_on] if isinstance(right_on, str) else list(right_on)
            if len(lkeys) != len(rkeys):
                raise ValueError(
                    f"join: left_on has {len(lkeys)} keys but right_on has"
                    f" {len(rkeys)}"
                )
            using = False
        missing_l = [k for k in lkeys if k not in ldf.columns]
        missing_r = [k for k in rkeys if k not in rdf.columns]
        if missing_l or missing_r:
            raise MissingColumnError(
                f"join: left={missing_l} right={missing_r}"
            )
        if coalesce is None:
            coalesce = using and how != "full"

        # rename every right column to a temp name: no ambiguity, ever
        tmp = {c: f"__tdr__{i}" for i, c in enumerate(rdf.columns)}
        rdf2 = rdf.select(*[_q(c).alias(tmp[c]) for c in rdf.columns])
        conds = []
        for lk, rk in zip(lkeys, rkeys):
            l, r = _q(lk), F.col(tmp[rk])
            conds.append(l.eqNullSafe(r) if join_nulls else (l == r))
        cond = conds[0]
        for c in conds[1:]:
            cond = cond & c

        joined = ldf.join(rdf2, cond, spark_how)
        if spark_how in ("left_semi", "left_anti"):
            return self._rebuild(joined)

        out_cols: list[Column] = []
        left_names = set(ldf.columns)
        for c in ldf.columns:
            if S.is_system_column(c):
                continue
            if using and coalesce and c in lkeys and how in ("right", "full"):
                out_cols.append(F.coalesce(_q(c), F.col(tmp[c])).alias(c))
            else:
                out_cols.append(_q(c).alias(c))
        for c in rdf.columns:
            if using and c in rkeys:
                if coalesce:
                    continue  # merged into left key
                out_cols.append(F.col(tmp[c]).alias(c + suffix))
                continue
            name = c + suffix if c in left_names else c
            out_cols.append(F.col(tmp[c]).alias(name))
        # keep left system columns
        for c in S.system_columns_present(self._df):
            out_cols.append(_q(c))
        return self._rebuild(joined.select(*out_cols))

    # ------------------------------------------------------------------
    # udf / grok / dq
    # ------------------------------------------------------------------
    def udf(self, on: Any, function: Any) -> "TableFrame":
        from .udf import apply_udf

        return apply_udf(self, on, function)

    def grok(self, column: str, pattern: str, schema: Sequence[Any] | None = None) -> "TableFrame":
        from .grok import apply_grok

        return apply_grok(self, column, pattern, schema)

    @property
    def dq(self):
        from .dq import DQEngine

        return DQEngine(self)
    # alias matching the reference's private name
    _dq = dq


def _col_name(df: DataFrame, c: Column) -> str:
    """Best-effort output name of a Column expression."""
    try:
        return df.select(c).columns[0]
    except Exception:
        return str(c)
