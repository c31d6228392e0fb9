"""Error types mirroring the reference's error-code discipline.

The reference raises coded errors (e.g. TF10 for reserved-prefix column
names, client/td-sdk/tabsdata/_utils/tableframe/_common.py:42-47); we keep a
small typed hierarchy with the same codes in messages so tests can assert on
them.
"""

from __future__ import annotations


class TabsdataSparkError(Exception):
    """Base error."""

    code = "TD00"

    def __init__(self, message: str):
        super().__init__(f"[{self.code}] {message}")


class ReservedColumnError(TabsdataSparkError):
    """User column names may not start with the `$td.` system prefix
    (reference: _utils/tableframe/_common.py:42-47, error TF10)."""

    code = "TF10"


class MissingColumnError(TabsdataSparkError):
    code = "TF20"


class DuplicateColumnError(TabsdataSparkError):
    """A projection/rename would produce two columns with the same name
    (Polars raises DuplicateError; reference rename delegates to
    pl.LazyFrame.rename, lazyframe/frame.py:1445)."""

    code = "TF21"


class SchemaMismatchError(TabsdataSparkError):
    code = "TF30"


class ShapeError(TabsdataSparkError):
    """Raised by `item()` / `first_row()` when the frame shape does not
    permit scalar extraction (reference: tableframe/dataframe/frame.py:19-42)."""

    code = "TF40"


class UnsupportedOperationError(TabsdataSparkError):
    """Operation blocked by design (reference: _utils/tableframe/_constants.py:52-82)."""

    code = "TF50"


class VersionResolutionError(TabsdataSparkError):
    """Bad version ref (reference: client/td-sdk/tabsdata/_tableuri.py)."""

    code = "TV10"
