"""Trigger graph: bipartite DAG of Function and Table nodes.

Parity with the reference's ExecutionGraph (server/libraries/td-objects/src/
execution/graph.rs:25-80 — GraphNode::Function|Table, edges Output | Trigger
| Dependency) and its builder + cycle validation
(ta-execution/src/graphs.rs:37-158,173-201).  Pure Python, no external
graph dependency — the graph is metadata-sized (functions x tables), never
data-sized."""

from __future__ import annotations

from dataclasses import dataclass, field

from ..errors import TabsdataSparkError
from .decorators import TabsdataFunction


class CycleError(TabsdataSparkError):
    code = "TG10"


def _norm(collection: str, uri: str) -> str:
    """table uri -> canonical 'collection/table' (version refs stripped —
    trigger edges are version-independent)."""
    base = uri.split("@", 1)[0]
    if "/" not in base:
        base = f"{collection}/{base}"
    return base


@dataclass
class TriggerGraph:
    functions: dict[str, tuple[str, TabsdataFunction]] = field(default_factory=dict)
    # table 'coll/name' -> function keys it triggers
    triggers: dict[str, list[str]] = field(default_factory=dict)
    # function key -> output tables 'coll/name'
    outputs: dict[str, list[str]] = field(default_factory=dict)
    # function key -> dependency tables
    dependencies: dict[str, list[str]] = field(default_factory=dict)

    def add(self, collection: str, fn: TabsdataFunction) -> None:
        key = f"{collection}/{fn.name}"
        self.functions[key] = (collection, fn)
        self.outputs[key] = [_norm(collection, t) for t in fn.output_tables]
        self.dependencies[key] = [_norm(collection, t) for t in fn.input_tables]
        for t in fn.trigger_tables():
            self.triggers.setdefault(_norm(collection, t), []).append(key)
        self.validate()

    def triggered_by(self, table: str) -> list[str]:
        return self.triggers.get(table, [])

    def validate(self) -> None:
        """Cycle detection over trigger edges (function -> output table ->
        triggered function), matching the reference's DAG validation
        (graphs.rs:173-201)."""
        color: dict[str, int] = {}

        def dfs(key: str, stack: list[str]) -> None:
            color[key] = 1
            for table in self.outputs.get(key, []):
                for nxt in self.triggers.get(table, []):
                    if color.get(nxt) == 1:
                        raise CycleError(
                            "trigger cycle: " + " -> ".join(stack + [nxt]))
                    if color.get(nxt, 0) == 0:
                        dfs(nxt, stack + [nxt])
            color[key] = 2

        for key in self.functions:
            if color.get(key, 0) == 0:
                dfs(key, [key])

    def downstream_plan(self, updated_tables: list[str]) -> list[str]:
        """BFS: functions to run, in dependency order, given freshly
        published tables (the pub/sub loop of SURVEY §3.2.7)."""
        plan: list[str] = []
        seen: set[str] = set()
        frontier = list(updated_tables)
        while frontier:
            next_tables: list[str] = []
            for table in frontier:
                for fn_key in self.triggers.get(table, []):
                    if fn_key not in seen:
                        seen.add(fn_key)
                        plan.append(fn_key)
                        next_tables.extend(self.outputs.get(fn_key, []))
            frontier = next_tables
        return plan
