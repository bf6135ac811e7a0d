"""Query registry: one entry per implemented operator (SURVEY.md §2).

Each query is registered with a Spark callable ``(spark, sf_dir) ->
DataFrame`` and, when SQL-expressible, a DuckDB oracle SQL string over
the same parquet tables. The driver compares row-count + schema +
order-insensitive value-hash, so every computed column is aliased
identically on both sides and floating aggregates go through exact
DECIMAL arithmetic before a final cast to double (summation order then
cannot change the result).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import query modules lazily so registration happens on first use.
    from sales_agent_graphdb_spark import queries as _q  # noqa: F401

    return dict(_REGISTRY)


def spark_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
