"""System-column (provenance) model.

The reference silently carries `$td.`-prefixed columns on every TableFrame
(reference: client/td-sdk/tabsdata/_utils/tableframe/_constants.py:107,149-155):

    $td.id              per-row unique id     REGENERATE on store
    $td.ver.execution   execution id          PROPAGATE
    $td.ver.transaction transaction id        PROPAGATE
    $td.ver.version     table version id      PROPAGATE
    $td.ver.timestamp   trigger timestamp     PROPAGATE

Spark-first design decision: the four `$td.ver.*` columns are *constant per
frame*, so we carry them as lightweight Python properties on the wrapper and
only materialize them into the plan when (a) the user references a `$td.ver.*`
virtual column, or (b) the frame is stored.  `$td.id` is REGENERATE-policy —
the reference re-creates it on every store anyway (_constants.py:178-185) —
so we generate it with `uuid()` exactly once, at store time.  This keeps
every intermediate Catalyst plan free of nondeterministic expressions (which
would otherwise inhibit filter pushdown through projections) and costs
nothing at 100 TB: constants fold, and uuid() runs once per stored row.

Loaded tables (`tab` mode, _utils/tableframe/_common.py:24-39) may already
contain physical `$td.*` columns; those are preserved and win over the
virtual properties.
"""

from __future__ import annotations

import datetime as _dt
import uuid as _uuid
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

TD_PREFIX = "$td."
COL_ID = "$td.id"
COL_EXECUTION = "$td.ver.execution"
COL_TRANSACTION = "$td.ver.transaction"
COL_VERSION = "$td.ver.version"
COL_TIMESTAMP = "$td.ver.timestamp"

SYSTEM_COLUMNS = [COL_ID, COL_EXECUTION, COL_TRANSACTION, COL_VERSION, COL_TIMESTAMP]
#: virtual columns users may *read* (reference: _constants.py:110-112,159-163)
READABLE_PREFIX = "$td.ver."

JOIN_SUFFIX = "_right"


def new_system_id() -> str:
    """26-char uppercase id, same shape as the reference's ids
    (reference: client/td-sdk/tabsdata/_tableuri.py:27 regex)."""
    return _uuid.uuid4().hex.upper()[:26]


@dataclass(frozen=True)
class FrameProperties:
    """Per-frame provenance constants (reference:
    tableframe/lazyframe/properties.py:23-28)."""

    execution: str | None = None
    transaction: str | None = None
    version: str | None = None
    timestamp: _dt.datetime | None = field(default=None)

    @staticmethod
    def fresh() -> "FrameProperties":
        return FrameProperties(
            execution=new_system_id(),
            transaction=new_system_id(),
            version=new_system_id(),
            timestamp=_dt.datetime.now(_dt.timezone.utc),
        )


def is_system_column(name: str) -> bool:
    return name.startswith(TD_PREFIX)


def user_columns(df: DataFrame) -> list[str]:
    return [c for c in df.columns if not is_system_column(c)]


def system_columns_present(df: DataFrame) -> list[str]:
    return [c for c in df.columns if is_system_column(c)]


def virtual_column(props: FrameProperties, name: str) -> "F.Column":
    """Resolve a readable `$td.ver.*` virtual column to a literal."""
    mapping = {
        COL_EXECUTION: props.execution,
        COL_TRANSACTION: props.transaction,
        COL_VERSION: props.version,
    }
    if name in mapping:
        return F.lit(mapping[name]).cast("string")
    if name == COL_TIMESTAMP:
        return F.lit(props.timestamp).cast("timestamp")
    raise KeyError(name)


def materialize_for_store(df: DataFrame, props: FrameProperties) -> DataFrame:
    """`sys` mode: regenerate REGENERATE-policy columns, stamp PROPAGATE ones
    (reference: _utils/tableframe/_common.py:81-147).  Called exactly once,
    when a frame is written as a new table version."""
    out = df
    cols = set(df.columns)
    out = out.withColumn(COL_ID, F.expr("uuid()"))  # REGENERATE
    for name in (COL_EXECUTION, COL_TRANSACTION, COL_VERSION, COL_TIMESTAMP):
        if name not in cols:  # PROPAGATE: keep existing, else stamp
            out = out.withColumn(name, virtual_column(props, name))
    ordered = user_columns(out) + [c for c in SYSTEM_COLUMNS if c in out.columns]
    return out.select(*[F.col(f"`{c}`") for c in ordered])
