"""Expression surface: a thin, Spark-first wrapper over pyspark Column.

Parity target: the reference's `Expr` (client/td-sdk/tabsdata/tableframe/
expr/expr.py, ~2758 LoC) plus its `str` (expr/string.py) and `dt`
(functions/datetime.py) namespaces — see SURVEY.md §2.5-2.6 for the full
method-by-method mapping.  Everything here compiles to built-in Catalyst
expressions (JVM-side, whole-stage-codegen-able); there are NO Python UDFs
in this module, so the entire scalar surface runs at native speed at any
scale.
"""

from __future__ import annotations

import re as _re
from typing import Any, Iterable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.window import Window

from ..errors import UnsupportedOperationError

__all__ = ["Expr", "to_column", "wrap"]


def to_column(value: Any) -> Column:
    """Expr | Column | python literal -> Column (literals wrapped)."""
    if isinstance(value, Expr):
        return value._col
    if isinstance(value, Column):
        return value
    return F.lit(value)


def wrap(col: Column) -> "Expr":
    return Expr(col)


def _cc(value: Any) -> Column:
    """Like to_column but interprets bare strings as column names (used for
    `by`/`on` style parameters, matching the reference's name-or-expr rule)."""
    if isinstance(value, str):
        return F.col(f"`{value}`") if "." in value else F.col(value)
    return to_column(value)


def _regex_quote(pattern: str) -> str:
    """Literal pattern -> java-regex-safe (\\Q...\\E, Pattern.quote style)."""
    return "\\Q" + pattern.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _char_class(chars: str) -> str:
    """Build a java regex character class matching any char in `chars`."""
    return "[" + _re.sub(r"([\\\]\[\^\-])", r"\\\1", chars) + "]"


def _ansi_enabled() -> bool:
    """Effective ANSI mode of the active session.

    Spark 4 defaults `spark.sql.ansi.enabled` to **true**, so this must be
    read with NO explicit default: `conf.get(key, default)` returns the
    supplied default whenever the user never set the key, hiding Spark's
    own built-in default.  A bare `conf.get(key)` resolves to the effective
    runtime value ("true" on a vanilla Spark 4 session).

    When detection is impossible (no active session, exotic backend) we
    assume ANSI **on**: `try_cast` is correct under either mode, while a
    plain cast throws under ANSI — so the safe fallback is the one that
    never raises.
    """
    try:
        from pyspark.sql import SparkSession

        sess = SparkSession.getActiveSession()
        if sess is None:
            return True
        return str(sess.conf.get("spark.sql.ansi.enabled")).lower() == "true"
    except Exception:
        return True


class Expr:
    """Lazy column expression (reference: tableframe/expr/expr.py:63-2758)."""

    __slots__ = ("_col", "_name")

    def __init__(self, col: Column, name: str | None = None):
        self._col = col
        # best-effort output name (set by td.col / .alias), used for
        # JVM-free duplicate-output detection in select()
        self._name = name

    # ---- plumbing -------------------------------------------------------
    def __repr__(self) -> str:  # pragma: no cover
        return f"Expr({self._col})"

    def _new(self, col: Column) -> "Expr":
        return Expr(col)

    @property
    def spark(self) -> Column:
        """Escape hatch: the underlying pyspark Column."""
        return self._col

    # ---- arithmetic dunders (expr.py:63-176) ----------------------------
    def __add__(self, other):
        return self._new(self._col + to_column(other))

    def __radd__(self, other):
        return self._new(to_column(other) + self._col)

    def __sub__(self, other):
        return self._new(self._col - to_column(other))

    def __rsub__(self, other):
        return self._new(to_column(other) - self._col)

    def __mul__(self, other):
        return self._new(self._col * to_column(other))

    def __rmul__(self, other):
        return self._new(to_column(other) * self._col)

    def __truediv__(self, other):
        return self._new(self._col / to_column(other))

    def __rtruediv__(self, other):
        return self._new(to_column(other) / self._col)

    def __floordiv__(self, other):
        return self._new(F.floor(self._col / to_column(other)))

    def __rfloordiv__(self, other):
        return self._new(F.floor(to_column(other) / self._col))

    def __mod__(self, other):
        return self._new(self._col % to_column(other))

    def __rmod__(self, other):
        return self._new(to_column(other) % self._col)

    def __pow__(self, other):
        return self._new(F.pow(self._col, to_column(other)))

    def __rpow__(self, other):
        return self._new(F.pow(to_column(other), self._col))

    def __neg__(self):
        return self._new(-self._col)

    def __abs__(self):
        return self._new(F.abs(self._col))

    def __invert__(self):
        return self._new(~self._col)

    def __and__(self, other):
        return self._new(self._col & to_column(other))

    def __rand__(self, other):
        return self._new(to_column(other) & self._col)

    def __or__(self, other):
        return self._new(self._col | to_column(other))

    def __ror__(self, other):
        return self._new(to_column(other) | self._col)

    def __xor__(self, other):
        return self._new(self._col.__ne__(to_column(other)))  # bool xor

    def __eq__(self, other):  # type: ignore[override]
        return self._new(self._col == to_column(other))

    def __ne__(self, other):  # type: ignore[override]
        return self._new(self._col != to_column(other))

    def __lt__(self, other):
        return self._new(self._col < to_column(other))

    def __le__(self, other):
        return self._new(self._col <= to_column(other))

    def __gt__(self, other):
        return self._new(self._col > to_column(other))

    def __ge__(self, other):
        return self._new(self._col >= to_column(other))

    def __hash__(self):
        return id(self)

    # ---- named arithmetic (expr.py:188-2707) ----------------------------
    def add(self, other):
        return self.__add__(other)

    def sub(self, other):
        return self.__sub__(other)

    def mul(self, other):
        return self.__mul__(other)

    def truediv(self, other):
        return self.__truediv__(other)

    def floordiv(self, other):
        return self.__floordiv__(other)

    def mod(self, other):
        return self.__mod__(other)

    def pow(self, other):
        return self.__pow__(other)

    def neg(self):
        return self.__neg__()

    def abs(self):
        return self._new(F.abs(self._col))

    # comparisons
    def eq(self, other):
        return self.__eq__(other)

    def eq_missing(self, other):
        """Null-safe equality (reference expr.py:776) -> Spark `<=>`."""
        return self._new(self._col.eqNullSafe(to_column(other)))

    def ne(self, other):
        return self.__ne__(other)

    def ne_missing(self, other):
        return self._new(~self._col.eqNullSafe(to_column(other)))

    def lt(self, other):
        return self.__lt__(other)

    def le(self, other):
        return self.__le__(other)

    def gt(self, other):
        return self.__gt__(other)

    def ge(self, other):
        return self.__ge__(other)

    # boolean
    def and_(self, *others):
        col = self._col
        for o in others:
            col = col & to_column(o)
        return self._new(col)

    def or_(self, *others):
        col = self._col
        for o in others:
            col = col | to_column(o)
        return self._new(col)

    def xor(self, other):
        return self.__xor__(other)

    def not_(self):
        return self._new(~self._col)

    # ---- predicates -----------------------------------------------------
    def is_between(self, lower, upper, closed: str = "both"):
        lo, hi = to_column(lower), to_column(upper)
        if closed == "both":
            c = (self._col >= lo) & (self._col <= hi)
        elif closed == "left":
            c = (self._col >= lo) & (self._col < hi)
        elif closed == "right":
            c = (self._col > lo) & (self._col <= hi)
        elif closed == "none":
            c = (self._col > lo) & (self._col < hi)
        else:
            raise ValueError(
                f"is_between: closed must be one of 'both', 'left',"
                f" 'right', 'none'; got {closed!r}"
            )
        return self._new(c)

    def is_in(self, values):
        if isinstance(values, Expr):
            raise UnsupportedOperationError("is_in over expression lists")
        return self._new(self._col.isin(list(values)))

    def is_null(self):
        return self._new(self._col.isNull())

    def is_not_null(self):
        return self._new(self._col.isNotNull())

    def is_nan(self):
        return self._new(F.isnan(self._col))

    def is_not_nan(self):
        return self._new(~F.isnan(self._col))

    def is_finite(self):
        return self._new(
            ~F.isnan(self._col)
            & (self._col != F.lit(float("inf")))
            & (self._col != F.lit(float("-inf")))
        )

    def is_infinite(self):
        return self._new(
            (self._col == F.lit(float("inf"))) | (self._col == F.lit(float("-inf")))
        )

    def is_unique(self):
        """Per-row uniqueness flag (expr.py:1372): value occurs exactly once.
        Window over the value itself — shuffles by value, scales like a
        group-by on the column."""
        w = Window.partitionBy(self._col)
        return self._new(F.count(F.lit(1)).over(w) == 1)

    # ---- math (expr.py §2.6) -------------------------------------------
    def sqrt(self):
        return self._new(F.sqrt(self._col))

    def cbrt(self):
        return self._new(F.cbrt(self._col))

    def exp(self):
        return self._new(F.exp(self._col))

    @staticmethod
    def _log_domain(arg: Column, raw: Column, zero_point: float = 0.0) -> Column:
        """Polars/IEEE log semantics: NaN below the domain, -inf at the
        boundary — Spark's SQL logs return NULL for both."""
        return (
            F.when(F.isnan(arg.cast("double")), F.lit(float("nan")))
            .when(arg < zero_point, F.lit(float("nan")))
            .when(arg == zero_point, F.lit(float("-inf")))
            .otherwise(raw)
        )

    def log(self, base: float | None = None):
        if base is None:
            return self._new(self._log_domain(self._col, F.log(self._col)))
        return self._new(
            self._log_domain(self._col, F.log(float(base), self._col))
        )

    def log1p(self):
        return self._new(
            self._log_domain(self._col, F.log1p(self._col), zero_point=-1.0)
        )

    def log10(self):
        return self._new(self._log_domain(self._col, F.log10(self._col)))

    def sin(self):
        return self._new(F.sin(self._col))

    def cos(self):
        return self._new(F.cos(self._col))

    def tan(self):
        return self._new(F.tan(self._col))

    def sinh(self):
        return self._new(F.sinh(self._col))

    def cosh(self):
        return self._new(F.cosh(self._col))

    def tanh(self):
        return self._new(F.tanh(self._col))

    def arcsin(self):
        return self._new(F.asin(self._col))

    def arccos(self):
        return self._new(F.acos(self._col))

    def arctan(self):
        return self._new(F.atan(self._col))

    def arcsinh(self):
        return self._new(F.asinh(self._col))

    def arccosh(self):
        return self._new(F.acosh(self._col))

    def arctanh(self):
        return self._new(F.atanh(self._col))

    def cot(self):
        return self._new(F.cot(self._col))

    def degrees(self):
        return self._new(F.degrees(self._col))

    def radians(self):
        return self._new(F.radians(self._col))

    def sign(self):
        return self._new(F.signum(self._col))

    def floor(self):
        return self._new(F.floor(self._col))

    def ceil(self):
        return self._new(F.ceil(self._col))

    def round(self, decimals: int = 0):
        return self._new(F.round(self._col, decimals))

    def round_sig_figs(self, digits: int):
        """Round to significant figures (expr.py:1993) via log10 formula."""
        c = self._col
        mag = F.floor(F.log10(F.abs(c)))
        factor = F.pow(F.lit(10.0), mag - F.lit(digits - 1))
        rounded = F.round(c / factor, 0) * factor
        return self._new(F.when(c == 0, F.lit(0.0)).otherwise(rounded))

    def clip(self, lower_bound=None, upper_bound=None):
        c = self._col
        if lower_bound is not None:
            c = F.greatest(c, to_column(lower_bound))
        if upper_bound is not None:
            c = F.least(c, to_column(upper_bound))
        return self._new(c)

    def shrink_dtype(self):
        """Data-dependent downcast is not expressible lazily on Spark; the
        reference delegates to Polars chunk stats (expr.py:2040).  No-op:
        Parquet encoding already bit-packs narrow ranges, so the storage win
        the reference gets is free here."""
        return self

    def reinterpret(self, signed: bool = True):
        """Spark has no unsigned ints (SURVEY §1.3 narrowing table); cast to
        long as the documented mapping."""
        return self._new(self._col.cast("long"))

    # ---- misc -----------------------------------------------------------
    def alias(self, name: str):
        return Expr(self._col.alias(name), name=name)

    def cast(self, dtype, strict: bool = False):
        from .dtypes import to_spark_type

        target = to_spark_type(dtype)
        if strict:
            # Polars strict cast raises on conversion failure.  Under an
            # ANSI-on session plain cast() already throws CAST_INVALID_INPUT
            # with a value-carrying message — no guard needed.  Under a
            # legacy (ANSI-off) session cast() nulls bad values, so guard:
            # a non-null input that casts to null is a failure.  (Overflow
            # wraps in legacy mode and is not caught; documented narrowing.)
            casted = self._col.cast(target)
            if _ansi_enabled():
                return self._new(casted)
            return self._new(
                F.when(
                    self._col.isNotNull() & casted.isNull(),
                    F.raise_error(F.concat(
                        F.lit(f"strict cast to {target.simpleString()} "
                              f"failed for value: "),
                        self._col.cast("string"))),
                ).otherwise(casted)
            )
        # Non-strict: legacy cast (ANSI off) nulls bad values on a branch,
        # while try_cast's failure path is exception-driven — ~20x slower
        # when most values fail to parse (measured: 5.0s vs 0.2s per 600k
        # all-fail string->bigint rows).  Only fall back to try_cast if the
        # active session runs ANSI-on, where plain cast would throw.
        return self._new(
            self._col.try_cast(target) if _ansi_enabled()
            else self._col.cast(target)
        )

    def fill_null(self, value):
        return self._new(F.coalesce(self._col, to_column(value)))

    def fill_nan(self, value):
        return self._new(
            F.when(F.isnan(self._col), to_column(value)).otherwise(self._col)
        )

    def filter(self, *predicates):
        """Filter values within an aggregation context (expr.py:913)."""
        cond = None
        for p in predicates:
            pc = to_column(p)
            cond = pc if cond is None else (cond & pc)
        return self._new(F.when(cond, self._col))

    def hash(self, seed: int = 0):
        return self._new(F.xxhash64(self._col, F.lit(seed)))

    def slice(self, offset: int, length: int | None = None):
        raise UnsupportedOperationError(
            "Expr.slice is positional; use TableFrame.slice (Spark has no "
            "stable physical row order)"
        )

    def rank(self, method: str = "average", descending: bool = False):
        """Whole-column rank (expr.py:1843).  NOTE: a global rank is a global
        sort — on a cluster this is a single-pass range-partitioned sort,
        inherently all-to-all.  Fine as the reference semantics demand it."""
        if method not in ("average", "min", "max", "dense", "ordinal",
                          "random"):
            raise ValueError(
                f"rank: method must be one of 'average', 'min', 'max',"
                f" 'dense', 'ordinal', 'random'; got {method!r}"
            )
        # nulls sort LAST so they never shift non-null ranks; their own
        # rank is null (Polars: null values get a null rank)
        ordered = (self._col.desc_nulls_last() if descending
                   else self._col.asc_nulls_last())
        w = Window.orderBy(ordered)
        ties = Window.partitionBy(self._col)
        if method == "min":
            c = F.rank().over(w)
        elif method == "max":
            c = F.rank().over(w) + F.count(F.lit(1)).over(ties) - 1
        elif method == "dense":
            c = F.dense_rank().over(w)
        elif method == "ordinal":
            c = F.row_number().over(w)
        elif method == "random":
            c = F.row_number().over(Window.orderBy(ordered, F.rand()))
        else:  # average
            mn = F.rank().over(w)
            c = (mn * 2 + F.count(F.lit(1)).over(ties) - 1) / 2.0
        return self._new(F.when(self._col.isNotNull(), c))

    def diff(self, n: int = 1, order_by=None):
        """Lag difference (expr.py:1884).  Polars uses physical row order;
        Spark has none, so pass `order_by` (or sort the frame first — the
        frame-level ops thread their sort keys here via TableFrame)."""
        if order_by is None:
            order = [F.monotonically_increasing_id()]
        elif isinstance(order_by, (list, tuple)):
            order = [_cc(o) for o in order_by]
        else:
            order = [_cc(order_by)]
        w = Window.orderBy(*order)
        return self._new(self._col - F.lag(self._col, n).over(w))

    # ---- aggregations (expr.py:967-2570) --------------------------------
    def max(self):
        return self._new(F.max(self._col))

    def min(self):
        return self._new(F.min(self._col))

    def sum(self):
        return self._new(F.sum(self._col))

    def mean(self):
        return self._new(F.avg(self._col))

    def median(self):
        return self._new(F.median(self._col))

    def n_unique(self):
        """Distinct count incl. nulls (Polars counts null as a value)."""
        return self._new(
            F.count_distinct(self._col)
            + F.max(F.when(self._col.isNull(), 1).otherwise(0))
        )

    def count(self):
        return self._new(F.count(self._col))

    def len(self):
        return self._new(F.count(F.lit(1)))

    def first(self):
        return self._new(F.first(self._col, ignorenulls=False))

    def last(self):
        return self._new(F.last(self._col, ignorenulls=False))

    # ---- namespaces -----------------------------------------------------
    @property
    def str(self) -> "ExprStringNameSpace":
        return ExprStringNameSpace(self)

    @property
    def dt(self) -> "ExprDateTimeNameSpace":
        return ExprDateTimeNameSpace(self)


class ExprStringNameSpace:
    """Parity with reference tableframe/expr/string.py (1175 LoC) — every
    method compiles to a JVM string/regex expression."""

    __slots__ = ("_e",)

    def __init__(self, parent: Expr):
        self._e = parent

    @property
    def _c(self) -> Column:
        return self._e._col

    def _new(self, col: Column) -> Expr:
        return Expr(col)

    # temporal parsing (string.py:41-167)
    def to_date(self, format: str | None = None, strict: bool = True):
        fmt = _strptime_to_spark(format)
        return self._new(F.to_date(self._c, fmt) if fmt else F.to_date(self._c))

    def to_datetime(self, format: str | None = None, strict: bool = True):
        fmt = _strptime_to_spark(format)
        return self._new(
            F.to_timestamp(self._c, fmt) if fmt else F.to_timestamp(self._c)
        )

    def to_time(self, format: str | None = None, strict: bool = True):
        """Polars Time -> seconds-of-day mapping (SURVEY §1.3: Spark has no
        TimeType); parse then take seconds since midnight."""
        fmt = _strptime_to_spark(format) or "HH:mm:ss"
        ts = F.to_timestamp(self._c, fmt)
        return self._new(
            (F.hour(ts) * 3600 + F.minute(ts) * 60 + F.second(ts)).cast("long")
        )

    # lengths / case (string.py:168-292)
    def len_bytes(self):
        return self._new(F.octet_length(self._c))

    def len_chars(self):
        return self._new(F.char_length(self._c))

    def to_uppercase(self):
        return self._new(F.upper(self._c))

    def to_lowercase(self):
        return self._new(F.lower(self._c))

    def to_titlecase(self):
        # Polars capitalizes after ANY non-alphabetic char ("o'neil" ->
        # "O'Neil", "foo2bar" -> "Foo2Bar"); Spark initcap only splits on
        # whitespace.  Single-pass char transform, no UDF: uppercase a
        # letter when the previous char is non-alphabetic.
        low = F.split(F.lower(self._c), "")
        return self._new(
            F.array_join(
                F.transform(
                    low,
                    lambda ch, i: F.when(
                        (i == 0)
                        # element_at is 1-based, so index i is the previous
                        # char; clamp to 1 for i=0 (ANSI errors on index 0)
                        | ~F.element_at(
                            low, F.greatest(i, F.lit(1))
                        ).rlike("[\\p{L}]"),
                        F.upper(ch),
                    ).otherwise(ch),
                ),
                "",
            )
        )

    # strip family (string.py:293-458)
    def strip_chars(self, characters: str | None = None):
        if characters is None:
            # Polars strips all (unicode) whitespace; Spark trim strips
            # only ASCII spaces
            return self._new(
                F.regexp_replace(self._c, r"(?U)^\s+|\s+\z", "")
            )
        return self._new(F.btrim(self._c, F.lit(characters)))

    def strip_chars_start(self, characters: str | None = None):
        cls = r"(?U)\s" if characters is None else _char_class(characters)
        return self._new(F.regexp_replace(self._c, f"^(?:{cls})+", ""))

    def strip_chars_end(self, characters: str | None = None):
        cls = r"(?U)\s" if characters is None else _char_class(characters)
        return self._new(F.regexp_replace(self._c, f"(?:{cls})+\\z", ""))

    def strip_prefix(self, prefix: str):
        p = F.lit(prefix)
        return self._new(
            F.when(
                self._c.startswith(p),
                self._c.substr(F.length(p) + 1, F.length(self._c)),
            ).otherwise(self._c)
        )

    def strip_suffix(self, suffix: str):
        s = F.lit(suffix)
        return self._new(
            F.when(
                self._c.endswith(s),
                self._c.substr(F.lit(1), F.length(self._c) - F.length(s)),
            ).otherwise(self._c)
        )

    # pad (string.py:459-547)
    def pad_start(self, length: int, fill_char: str = " "):
        # Polars pads to AT LEAST length and never truncates; Spark lpad
        # truncates longer strings, so guard on the current length.
        c = self._c
        return self._new(
            F.when(F.length(c) >= length, c).otherwise(F.lpad(c, length, fill_char))
        )

    def pad_end(self, length: int, fill_char: str = " "):
        c = self._c
        return self._new(
            F.when(F.length(c) >= length, c).otherwise(F.rpad(c, length, fill_char))
        )

    def zfill(self, length: int):
        # Python/Polars zfill: never truncates; a leading '-' stays in
        # front of the zeros (Polars handles only '-', not '+').
        c = self._c
        negative = c.startswith("-")
        body = F.lpad(F.substring(c, 2, 2**30), length - 1, "0")
        filled = F.when(negative, F.concat(F.lit("-"), body)).otherwise(
            F.lpad(c, length, "0")
        )
        return self._new(F.when(F.length(c) >= length, c).otherwise(filled))

    # search (string.py:548-778)
    def contains(self, pattern: str, literal: bool = False):
        if literal:
            return self._new(self._c.contains(pattern))
        return self._new(self._c.rlike(pattern))

    def find(self, pattern: str, literal: bool = False):
        """0-based BYTE offset of the first match, null if absent — Polars
        returns the Rust byte index (str::find / regex Match::start), not a
        character index; identical for ASCII, differs on multibyte text."""
        if literal:
            pos = F.locate(pattern, self._c)
        else:
            pos = F.regexp_instr(self._c, F.lit(pattern))
        # char position -> byte offset of the preceding prefix
        return self._new(
            F.when(pos > 0, F.octet_length(F.substring(self._c, 1, pos - 1)))
        )

    def ends_with(self, suffix: str):
        return self._new(self._c.endswith(suffix))

    def starts_with(self, prefix: str):
        return self._new(self._c.startswith(prefix))

    def extract(self, pattern: str, group_index: int = 1):
        return self._new(
            F.when(
                self._c.rlike(pattern),
                F.regexp_extract(self._c, pattern, group_index),
            )
        )

    def count_matches(self, pattern: str, literal: bool = False):
        pat = _regex_quote(pattern) if literal else pattern
        return self._new(F.regexp_count(self._c, F.lit(pat)))

    # replace (string.py:779-872)
    @staticmethod
    def _pattern_group_names(pattern: str) -> frozenset:
        """Named capture groups a pattern defines ((?<n>..) / (?P<n>..)).
        Java only accepts letter-initial letters+digits names, so any
        pattern that compiles JVM-side has Java-expressible names only.
        The scan is syntactic (it would also see a group inside an
        escaped literal '\\(?<x>'), which errs toward treating a ref as a
        real group — the same side Java's own compiler lands on."""
        return frozenset(
            _re.findall(r"\(\?P?<([A-Za-z][A-Za-z0-9]*)>", pattern))

    @staticmethod
    def _replacement_to_java(value: str, literal: bool, shift: int = 0,
                             group_names: frozenset = frozenset()) -> str:
        """Polars (rust-regex) replacement -> Java replacement: keep $N /
        ${...} capture-group refs, turn $$ into a literal $, escape
        everything else.  Java's ${...} form only allows LETTER-initial
        group names, so the rust numeric brace form ${N} is rewritten to
        $N.  Named refs — unbraced $name (longest [0-9A-Za-z_] run, rust
        rule) or braced ${name} — expand via Java's ${name} when the
        pattern defines the group, and expand to EMPTY (rust-regex
        unknown-group semantics) otherwise; Java would throw on the
        unknown name.  Numeric refs are shifted by `shift` in this same
        pass (the n-bounded replace() adds one prefix group) — escaped
        literals like $$1 are parsed as literals first, so the shift can
        never touch them.  literal=True patterns have no groups, so the
        value is fully escaped (Polars uses plain substring replace)."""
        if literal:
            return value.replace("\\", "\\\\").replace("$", "\\$")
        out, i = [], 0
        while i < len(value):
            ch = value[i]
            nxt = value[i + 1:i + 2]
            if ch == "\\":
                out.append("\\\\")
            elif ch == "$" and nxt == "$":
                out.append("\\$")
                i += 1
            elif ch == "$" and nxt.isdigit():
                j = i + 1
                while j < len(value) and value[j].isdigit():
                    j += 1
                num = int(value[i + 1:j])
                if shift and num == 0:
                    raise ValueError(
                        "replace(): $0 (whole-match) group refs are not"
                        " supported with n-bounded replace; use"
                        " replace_all()")
                out.append(f"${num + shift}")
                i = j - 1
            elif ch == "$" and nxt == "{":
                close = value.find("}", i + 2)
                name = value[i + 2:close] if close != -1 else ""
                if close != -1 and name.isdigit():
                    # Java rejects digit-initial names inside ${...};
                    # emit the unbraced $N form instead
                    num = int(name)
                    if shift and num == 0:
                        raise ValueError(
                            "replace(): $0 (whole-match) group refs are"
                            " not supported with n-bounded replace; use"
                            " replace_all()")
                    out.append(f"${num + shift}")
                    i = close
                elif close != -1:
                    # braced named ref: defined groups expand via Java's
                    # ${name}; unknown groups expand to empty (rust-regex
                    # semantics — Java would throw on the unknown name)
                    if name in group_names:
                        out.append(f"${{{name}}}")
                    i = close
                else:
                    # unclosed '${': rust-regex treats it as a literal
                    out.append("\\$")
            elif ch == "$" and nxt.isascii() and (nxt.isalpha()
                                                  or nxt == "_"):
                # unbraced named ref: rust-regex reads the longest run of
                # [0-9A-Za-z_] as the group name.  Defined groups rewrite
                # to Java's braced ${name} form (always Java-expressible:
                # the pattern compiled JVM-side); unknown groups expand
                # to empty like rust-regex.
                j = i + 1
                while j < len(value) and (value[j].isascii()
                                          and (value[j].isalnum()
                                               or value[j] == "_")):
                    j += 1
                name = value[i + 1:j]
                if name in group_names:
                    out.append(f"${{{name}}}")
                i = j - 1
            elif ch == "$":
                # '$' followed by anything that cannot start a group ref
                # (space, punctuation, or end-of-string): rust-regex
                # keeps it literal, and Java regexp_replace throws
                # INVALID_REGEXP_REPLACE on a bare '$', so escape it.
                out.append("\\$")
            else:
                out.append(ch)
            i += 1
        return "".join(out)

    def replace(self, pattern: str, value: str, literal: bool = False, n: int = 1):
        """Replace first n occurrences (Polars default n=1).  First-only via
        the lazy-prefix trick — stays a single JVM regexp_replace."""
        pat = _regex_quote(pattern) if literal else pattern
        # the ^((?s).*?) prefix group shifts user group refs by one:
        # $1 -> $2 etc.  Shifting happens inside the conversion pass so
        # an escaped literal ($$1) is never rewritten.
        shifted = self._replacement_to_java(
            value, literal, shift=1,
            group_names=self._pattern_group_names(pat))
        out = self._c
        for _ in range(n):
            out = F.regexp_replace(out, f"^((?s).*?)(?:{pat})", f"$1{shifted}")
        return self._new(out)

    def replace_all(self, pattern: str, value: str, literal: bool = False):
        pat = _regex_quote(pattern) if literal else pattern
        val = self._replacement_to_java(
            value, literal, group_names=self._pattern_group_names(pat))
        return self._new(F.regexp_replace(self._c, pat, val))

    def reverse(self):
        return self._new(F.reverse(self._c))

    # slicing (string.py:898-998)
    def slice(self, offset: int, length: int | None = None):
        if offset >= 0:
            pos = offset + 1
            if length is None:
                return self._new(F.substring(self._c, pos, 2**30))
            return self._new(F.substring(self._c, pos, length))
        # negative offset: from end, clamped like Polars
        start = F.greatest(F.length(self._c) + offset + 1, F.lit(1))
        ln = F.lit(2**30) if length is None else F.lit(length)
        return self._new(self._c.substr(start, ln))

    def head(self, n: int):
        # Polars: negative n takes all but the last |n| characters
        if n < 0:
            return self._new(
                F.substring(self._c, 1, F.greatest(F.length(self._c) + n,
                                                   F.lit(0)))
            )
        return self._new(F.left(self._c, F.lit(n)))

    def tail(self, n: int):
        # Polars: negative n takes all but the first |n| characters
        if n < 0:
            return self._new(F.substring(self._c, 1 - n, 2**30))
        return self._new(F.right(self._c, F.lit(n)))

    def to_integer(self, base: int = 10, strict: bool = True):
        if not 2 <= base <= 36:
            # Polars contract; without this base=1 builds digits='0' and
            # base>36 slices past the digit alphabet
            raise ValueError(
                f"str.to_integer: base must be in 2..36, got {base}")
        if base == 10:
            # Same ANSI routing as Expr.cast: ANSI-on sessions throw from
            # plain cast (strict) / need try_cast (non-strict); legacy
            # sessions null-on-error, so strict adds an explicit guard.
            if strict:
                casted = self._c.cast("long")
                if _ansi_enabled():
                    return self._new(casted)
                return self._new(
                    F.when(
                        self._c.isNotNull() & casted.isNull(),
                        F.raise_error(F.concat(
                            F.lit("str.to_integer failed for value: "),
                            self._c)),
                    ).otherwise(casted)
                )
            return self._new(
                self._c.try_cast("long") if _ansi_enabled()
                else self._c.cast("long")
            )
        # non-decimal bases: F.conv never fails (invalid digits silently
        # parse as 0), so gate on a digit-validity regex — Polars raises on
        # strict and nulls otherwise
        digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:base]
        cls = digits if base <= 10 else f"0-9a-{digits[-1]}A-{digits[-1].upper()}"
        valid = self._c.rlike(f"^-?[{cls}]+\\z")
        # F.conv reads a leading '-' as unsigned two's complement; strip the
        # sign, convert the magnitude, and re-apply
        neg = self._c.startswith("-")
        mag = F.when(neg, F.substring(self._c, 2, 2**30)).otherwise(self._c)
        unsigned = F.conv(mag, base, 10).cast("long")
        conv = F.when(neg, -unsigned).otherwise(unsigned)
        if strict:
            return self._new(
                F.when(
                    self._c.isNotNull() & ~valid,
                    F.raise_error(F.concat(
                        F.lit(f"str.to_integer base {base} failed for value: "),
                        self._c)),
                ).otherwise(conv)
            )
        return self._new(F.when(valid, conv))

    def contains_any(self, patterns: Sequence[str], ascii_case_insensitive: bool = False):
        alt = "|".join(_regex_quote(p) for p in patterns)
        flags = "(?i)" if ascii_case_insensitive else ""
        return self._new(self._c.rlike(f"{flags}(?:{alt})"))

    def replace_many(self, old: Sequence[str] | dict, new: Sequence[str] | None = None):
        if isinstance(old, dict):
            pairs = list(old.items())
        else:
            pairs = list(zip(old, new or []))
        c = self._c
        for o, nw in pairs:
            c = F.replace(c, F.lit(o), F.lit(nw))
        return self._new(c)

    def grok(self, pattern: str):
        """Grok pattern -> struct of captures (string.py:1122); compiler in
        tabsdata_spark.tableframe.grok (port of the public grok idea, not of
        the reference's Rust plugin)."""
        from .grok import grok_to_struct

        return self._new(grok_to_struct(self._c, pattern))


# strptime (chrono / Polars) -> Spark SimpleDateTime-ish pattern letters
_STRPTIME_MAP = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    "%.f": ".SSSSSS",
    "%p": "a",
    "%b": "MMM",
    "%B": "MMMM",
    "%a": "EEE",
    "%A": "EEEE",
    "%j": "DDD",
    "%z": "xx",
    "%:z": "xxx",
    "%Z": "zz",
    "%%": "%",
}


def _strptime_to_spark(fmt: str | None) -> str | None:
    if fmt is None:
        return None
    out = fmt
    for k, v in _STRPTIME_MAP.items():
        out = out.replace(k, v)
    return out


class ExprDateTimeNameSpace:
    """Parity with reference tableframe/functions/datetime.py (257 LoC)."""

    __slots__ = ("_e",)

    def __init__(self, parent: Expr):
        self._e = parent

    @property
    def _c(self) -> Column:
        return self._e._col

    def _new(self, col: Column) -> Expr:
        return Expr(col)

    # truncation / construction
    def truncate(self, every: str):
        unit = _duration_to_trunc_unit(every)
        return self._new(F.date_trunc(unit, self._c))

    def replace(self, **kwargs):
        ts = self._c.cast("timestamp")
        us = F.pmod(F.unix_micros(ts), F.lit(1_000_000))
        parts = {
            "year": F.year(self._c),
            "month": F.month(self._c),
            "day": F.dayofmonth(self._c),
            "hour": F.hour(self._c),
            "minute": F.minute(self._c),
            "second": F.second(self._c),
            "microsecond": us,
        }
        for k, v in kwargs.items():
            if k not in parts:
                # Polars raises on unsupported arguments — a typo like
                # microseconds= must not silently no-op
                raise TypeError(
                    f"dt.replace() got an unexpected keyword argument"
                    f" {k!r}; supported: {', '.join(parts)}")
            parts[k] = F.lit(v)
        # make_timestamp takes fractional seconds (micros precision) —
        # Polars replace keeps the sub-second part unless overridden
        sec = (parts["second"] + parts["microsecond"] / F.lit(1_000_000.0)) \
            .cast("decimal(16,6)")
        return self._new(
            F.make_timestamp(
                parts["year"], parts["month"], parts["day"],
                parts["hour"], parts["minute"], sec,
            )
        )

    def combine(self, time_sec):
        """date + seconds-of-day (Time maps to seconds, SURVEY §1.3)."""
        base = F.to_timestamp(F.to_date(self._c))
        return self._new(F.timestamp_seconds(F.unix_timestamp(base) + to_column(time_sec)))

    def to_string(self, format: str | None = None):
        fmt = _strptime_to_spark(format) or "yyyy-MM-dd HH:mm:ss"
        return self._new(F.date_format(self._c, fmt))

    def strftime(self, format: str):
        return self.to_string(format)

    # calendar fields
    def millennium(self):
        return self._new(F.floor((F.year(self._c) + 999) / 1000).cast("int"))

    def century(self):
        return self._new(F.floor((F.year(self._c) + 99) / 100).cast("int"))

    def year(self):
        return self._new(F.year(self._c))

    def is_leap_year(self):
        y = F.year(self._c)
        return self._new((y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0)))

    def iso_year(self):
        # ISO year = calendar year of the Thursday in the same ISO week
        return self._new(F.year(F.date_add(self._c, 3 - F.weekday(self._c))))

    def quarter(self):
        return self._new(F.quarter(self._c))

    def month(self):
        return self._new(F.month(self._c))

    def week(self):
        return self._new(F.weekofyear(self._c))

    def weekday(self):
        """ISO weekday 1=Mon..7=Sun (Polars semantics)."""
        return self._new(F.weekday(self._c) + 1)

    def day(self):
        return self._new(F.dayofmonth(self._c))

    def ordinal_day(self):
        return self._new(F.dayofyear(self._c))

    def time(self):
        """Seconds since midnight (Time mapping)."""
        return self._new(
            (F.hour(self._c) * 3600 + F.minute(self._c) * 60 + F.second(self._c)).cast("long")
        )

    def date(self):
        return self._new(F.to_date(self._c))

    def datetime(self):
        return self._new(self._c.cast("timestamp"))

    def hour(self):
        return self._new(F.hour(self._c))

    def minute(self):
        return self._new(F.minute(self._c))

    def second(self):
        return self._new(F.second(self._c))

    @property
    def _ts(self) -> Column:
        # NTZ parquet timestamps need an LTZ cast for unix_* (session tz UTC)
        return self._c.cast("timestamp")

    def millisecond(self):
        # pmod, not %: the time-of-day fraction is non-negative even for
        # pre-epoch instants (Polars extracts from the calendar time)
        return self._new(
            (F.pmod(F.unix_micros(self._ts), F.lit(1_000_000)) / 1000).cast("int")
        )

    def microsecond(self):
        return self._new(
            F.pmod(F.unix_micros(self._ts), F.lit(1_000_000)).cast("int")
        )

    def nanosecond(self):
        return self._new(
            (F.pmod(F.unix_micros(self._ts), F.lit(1_000_000)) * 1000).cast("long")
        )

    def epoch(self, time_unit: str = "us"):
        if time_unit == "s":
            return self._new(F.unix_timestamp(self._ts))
        if time_unit == "ms":
            return self._new(F.unix_millis(self._ts))
        if time_unit == "ns":
            return self._new(F.unix_micros(self._ts) * 1000)
        return self._new(F.unix_micros(self._ts))

    def timestamp(self, time_unit: str = "us"):
        return self.epoch(time_unit)

    def with_time_unit(self, time_unit: str):
        return self._e  # Spark timestamps are always micros

    def cast_time_unit(self, time_unit: str):
        return self._e

    def convert_time_zone(self, time_zone: str):
        return self._new(F.from_utc_timestamp(self._c, time_zone))

    def replace_time_zone(self, time_zone: str | None):
        if time_zone is None:
            return self._e
        return self._new(F.to_utc_timestamp(self._c, time_zone))

    # durations: mapped to DayTimeIntervalType; totals via exact micros
    def total_days(self):
        return self._new(self._total_div(86_400_000_000))

    def total_hours(self):
        return self._new(self._total_div(3_600_000_000))

    def total_minutes(self):
        return self._new(self._total_div(60_000_000))

    def total_seconds(self):
        return self._new(self._total_div(1_000_000))

    def total_milliseconds(self):
        return self._new(self._total_div(1000))

    def total_microseconds(self):
        return self._new(self._total_micros())

    def total_nanoseconds(self):
        return self._new(self._total_micros() * 1000)

    def _total_micros(self) -> Column:
        # exact micros of a DayTimeIntervalType: add it to the epoch and
        # read unix_micros — casting the interval to long truncates to
        # whole seconds and silently drops the sub-second part
        return F.unix_micros(F.timestamp_micros(F.lit(0)) + self._c)

    def _total_div(self, unit_us: int) -> Column:
        # truncate-toward-zero division (Polars/Rust i64 semantics), exact
        # over the full int64 range: strip the remainder first, then the
        # decimal division is an exact integer
        m = self._total_micros()
        exact = m - m % unit_us
        return (exact.cast("decimal(38,0)") / unit_us).cast("long")

    def offset_by(self, by: str):
        months, days, micros = _parse_offset(by)
        c = self._c.cast("timestamp")
        if months:
            # add_months returns a date — re-attach the time-of-day
            tod = F.unix_micros(c) - F.unix_micros(F.date_trunc("day", c))
            c = F.timestamp_micros(
                F.unix_micros(F.add_months(c, months).cast("timestamp")) + tod
            )
        total = micros + days * 86_400_000_000
        if total:
            c = F.timestamp_micros(F.unix_micros(c) + total)
        return self._new(c)

    def add_business_days(self, n: int):
        """Skip-weekend day add (datetime.py:22).  Pure expression: whole
        weeks then a when-chain for the remainder — no UDF."""
        c = F.to_date(self._c)
        if n == 0:
            return self._new(c)
        sign = 1 if n > 0 else -1
        weeks, rem = divmod(abs(n), 5)
        out = F.date_add(c, sign * weeks * 7)
        dow = F.weekday(out)  # 0=Mon..6=Sun
        for _ in range(rem):
            out = F.date_add(out, sign)
            dow = F.weekday(out)
            # roll off weekend
            out = F.when(dow == 5, F.date_add(out, sign * (2 if sign > 0 else 0))).otherwise(
                F.when(dow == 6, F.date_add(out, sign * 1 if sign > 0 else -2)).otherwise(out)
            )
        # if landed on weekend due to start, roll forward/backward
        dow = F.weekday(out)
        out = F.when(dow == 5, F.date_add(out, 2 * sign if sign > 0 else -1)).otherwise(
            F.when(dow == 6, F.date_add(out, 1 * sign if sign > 0 else -2)).otherwise(out)
        )
        return self._new(out)

    def month_start(self):
        return self._new(F.trunc(self._c, "month"))

    def month_end(self):
        return self._new(F.last_day(self._c))

    def base_utc_offset(self):
        return self._new(F.lit(0))  # session tz is UTC

    def dst_offset(self):
        return self._new(F.lit(0))


_DURATION_RE = _re.compile(r"(-?\d+)(mo|ns|us|ms|[smhdwyq])")


def _parse_offset(by: str) -> tuple[int, int, int]:
    """'1y2mo3d4h5m6s' -> (months, days, microseconds)."""
    months = days = micros = 0
    for num, unit in _DURATION_RE.findall(by):
        v = int(num)
        if unit == "y":
            months += 12 * v
        elif unit == "q":
            months += 3 * v
        elif unit == "mo":
            months += v
        elif unit == "w":
            days += 7 * v
        elif unit == "d":
            days += v
        elif unit == "h":
            micros += v * 3_600_000_000
        elif unit == "m":
            micros += v * 60_000_000
        elif unit == "s":
            micros += v * 1_000_000
        elif unit == "ms":
            micros += v * 1000
        elif unit == "us":
            micros += v
        elif unit == "ns":
            micros += v // 1000
    return months, days, micros


def _duration_to_trunc_unit(every: str) -> str:
    m = _DURATION_RE.fullmatch(every.strip())
    if not m:
        raise ValueError(f"unsupported truncate interval: {every}")
    unit = m.group(2)
    return {
        "y": "year",
        "q": "quarter",
        "mo": "month",
        "w": "week",
        "d": "day",
        "h": "hour",
        "m": "minute",
        "s": "second",
    }[unit]
