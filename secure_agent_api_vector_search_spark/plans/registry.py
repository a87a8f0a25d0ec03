"""Typed named-query registry — the engine's public API surface.

Reference mapping: the MCP toolset `customer_data_tools`
(tools.yaml:41-44, U3) groups two named, typed, parameterized queries;
callers can ONLY invoke these by name with validated parameters — never
raw SQL (the zero-trust property, README.md:67, U5). This registry
preserves that structure: each entry is a named query with a typed
Python callable; `oracle_sql` carries the ANSI-SQL twin used by the
DuckDB correctness oracle (None for ops SQL cannot express).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class NamedQuery:
    name: str
    fn: QueryFn
    oracle_sql: str | None = None  # ANSI SQL twin (DuckDB), None → rows-only check
    description: str = ""
    tags: tuple[str, ...] = ()


@dataclass
class Registry:
    queries: dict[str, NamedQuery] = field(default_factory=dict)

    def register(self, q: NamedQuery) -> None:
        if q.name in self.queries:
            raise ValueError(f"duplicate query name {q.name!r}")
        self.queries[q.name] = q

    def fns(self) -> dict[str, QueryFn]:
        return {name: q.fn for name, q in self.queries.items()}

    def oracles(self) -> dict[str, str]:
        return {name: q.oracle_sql for name, q in self.queries.items() if q.oracle_sql}
