"""Named-query registry.

Every operator from SURVEY.md §2 registers itself here as a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB oracle
SQL twin with IDENTICAL output column names — the driver hashes values after
sorting columns by name, so Spark aliases and SQL ``AS`` names must agree.

Determinism contract for every registered query:
- no LIMIT without a total order (unique tiebreaker column in the ORDER BY),
- float aggregates rounded to 4 decimals on BOTH sides (summation order
  differs between engines),
- integer sums cast to BIGINT in DuckDB (its sum() widens to HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is the DuckDB ANSI-SQL twin
    (omit for non-SQL-expressible ops → driver does a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every operator module (registration happens at import)."""
    from imagingdb_spark import operators  # noqa: F401
