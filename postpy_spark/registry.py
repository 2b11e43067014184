"""Driver-contract registry: named queries and their DuckDB oracle SQL.

Every operator declared done in SURVEY.md §2 registers here with a stable
name; ``__spark_entry__.py`` exposes the registry to the correctness driver.
``oracle=None`` marks non-SQL-expressible ops (driver falls back to a
rows-only check).

Contract rules encoded here (SURVEY.md §5.2):
- every computed column is aliased identically in the Spark plan and the SQL;
- derived float aggregates are rounded identically on both sides (float
  summation order differs between engines);
- results are order-insensitive (the driver hashes a sorted canonical form),
  but any ranking-within-ties must be made deterministic via unique-key
  tiebreaks in BOTH engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    group: str  # SURVEY.md §2 group tag, e.g. "B3"


_REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None, group: str = "?"):
    """Decorator: register fn as the driver-contract query `name`."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, group=group)
        return fn

    return deco


def load_all() -> dict[str, RegisteredQuery]:
    """Import every query module (side effect: decorators register)."""
    from postpy_spark.queries import (  # noqa: F401
        composite,
        etl_surface,
        functions,
        joins,
        llm_pipeline,
        relational,
        streaming_batch,
        udfs,
        windows,
    )

    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: rq.fn for n, rq in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {n: rq.oracle for n, rq in load_all().items() if rq.oracle is not None}
