"""Function-role decorators (reference client/td-sdk/tabsdata/_decorators.py:
publisher:42, transformer:102, subscriber:156).

A decorated function receives TableFrames and returns TableFrame(s); the
decorator attaches the IO spec consumed by the runner/scheduler."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Sequence


@dataclass
class TabsdataFunction:
    fn: Callable
    kind: str                         # publisher | transformer | subscriber
    name: str
    source: Any = None                # publisher: FileSource/SQLSource/SourcePlugin
    destination: Any = None           # subscriber: FileDestination/SQLDestination/plugin
    input_tables: Sequence[str] = field(default_factory=tuple)   # table URIs
    output_tables: Sequence[str] = field(default_factory=tuple)  # table names
    trigger_by: Sequence[str] | None = None  # table URIs; None -> all inputs
    partition_by: dict[str, list[str]] = field(default_factory=dict)
    # output table -> hive-partition columns (partition-variant storage)

    def __call__(self, *args, **kwargs):
        return self.fn(*args, **kwargs)

    def trigger_tables(self) -> list[str]:
        """Default trigger edges = inputs read at HEAD.  An input pinned to
        a PAST version (e.g. `acc@HEAD~1`, the self-dependency pattern) is
        a Dependency edge only — the reference models these as
        Dependency{self_dependency} edges, never Trigger edges
        (graph.rs:25-80), which is what makes accumulating transformers
        legal in an acyclic trigger graph."""
        if self.trigger_by is not None:
            return list(self.trigger_by)
        out = []
        for t in self.input_tables:
            ver = t.split("@", 1)[1] if "@" in t else None
            if ver is not None and ver.upper() != "HEAD":
                continue
            out.append(t)
        return out


def publisher(source: Any, tables: str | Sequence[str],
              trigger_by: Sequence[str] | None = None,
              name: str | None = None,
              partition_by: dict[str, list[str]] | None = None) -> Callable:
    """External source -> tables (reference _decorators.py:42).
    `partition_by` maps output table -> hive-partition columns."""
    outs = [tables] if isinstance(tables, str) else list(tables)

    def deco(fn: Callable) -> TabsdataFunction:
        return TabsdataFunction(
            fn=fn, kind="publisher", name=name or fn.__name__,
            source=source, output_tables=outs, trigger_by=trigger_by,
            partition_by=dict(partition_by or {}),
        )

    return deco


def transformer(input_tables: str | Sequence[str],
                output_tables: str | Sequence[str],
                trigger_by: Sequence[str] | None = None,
                name: str | None = None,
                partition_by: dict[str, list[str]] | None = None) -> Callable:
    """Tables -> tables (reference _decorators.py:102).
    `partition_by` maps output table -> hive-partition columns."""
    ins = [input_tables] if isinstance(input_tables, str) else list(input_tables)
    outs = [output_tables] if isinstance(output_tables, str) else list(output_tables)

    def deco(fn: Callable) -> TabsdataFunction:
        return TabsdataFunction(
            fn=fn, kind="transformer", name=name or fn.__name__,
            input_tables=ins, output_tables=outs, trigger_by=trigger_by,
            partition_by=dict(partition_by or {}),
        )

    return deco


def subscriber(tables: str | Sequence[str], destination: Any,
               trigger_by: Sequence[str] | None = None,
               name: str | None = None) -> Callable:
    """Tables -> external destination (reference _decorators.py:156)."""
    ins = [tables] if isinstance(tables, str) else list(tables)

    def deco(fn: Callable) -> TabsdataFunction:
        return TabsdataFunction(
            fn=fn, kind="subscriber", name=name or fn.__name__,
            destination=destination, input_tables=ins, trigger_by=trigger_by,
        )

    return deco
