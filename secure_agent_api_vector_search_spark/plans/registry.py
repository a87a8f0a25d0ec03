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
    # ANSI SQL twin (DuckDB), None → rows-only check. A zero-arg
    # callable is resolved lazily at collection time — for oracles that
    # must be GENERATED against the gate corpus (e.g. an independent
    # sequential BPE whose word→ids map is embedded as a VALUES table).
    oracle_sql: str | Callable[[], str] | None = None
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
        import sys

        out: dict[str, str] = {}
        for name, q in self.queries.items():
            if callable(q.oracle_sql):
                # a generator failure (e.g. its corpus parquet missing)
                # must degrade THAT entry to rows-only, not zero out
                # every other oracle in the map
                try:
                    sql = q.oracle_sql()
                except Exception as exc:  # noqa: BLE001
                    print(
                        f"registry: oracle generator for {name!r} failed "
                        f"({exc!r}); entry degrades to rows-only",
                        file=sys.stderr,
                    )
                    continue
            else:
                sql = q.oracle_sql
            if sql:
                out[name] = sql
        return out
