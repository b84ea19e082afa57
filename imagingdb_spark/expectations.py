"""Declarative data-quality expectations over catalog tables.

The reference enforces quality imperatively at ingest: required-key
asserts (utils/meta_utils.py:45-69), ID-format asserts
(utils/cli_utils.py:4-41), uniqueness count-must-be-zero checks
(database/db_operations.py:111-117), FK integrity via Postgres
constraints. At 100 TB assert-per-row is not a strategy — this module
generalizes those checks into DECLARATIVE expectations evaluated as ONE
Spark plan per table, returning a violations report instead of raising
mid-ingest (the dbt-tests / Great-Expectations shape, rebuilt on
DataFrame ops).

Design for scale:
- Row-local checks (not_null, accepted_values, regex/format, range)
  compile to ONE pass over the table: a single projection counting every
  violation per rule with conditional sums — no per-rule scans.
- Table-level checks need their natural shuffle and nothing more:
  `unique` is a groupBy(key) count filter (map-side partial), FK
  integrity is a LEFT ANTI join (AQE broadcasts the parent side when it
  fits — the dimension tables here).
- Nothing collects row-level data to the driver: reports are counts plus
  a bounded sample of offending keys (limit k, deterministic order).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SAMPLE_K = 5  # offending-key sample size per violated rule


@dataclass(frozen=True)
class Expectation:
    """One declarative rule. kind ∈ {'not_null', 'accepted_values',
    'matches', 'in_range', 'unique', 'foreign_key'}."""

    kind: str
    column: str
    values: list = field(default_factory=list)  # accepted_values
    pattern: str = ""                            # matches (Java regex)
    lo: float | None = None                      # in_range
    hi: float | None = None
    ref: DataFrame | None = None                 # foreign_key parent
    ref_column: str = ""                         # foreign_key parent key

    @property
    def name(self) -> str:
        return f"{self.kind}({self.column})"


def not_null(column: str) -> Expectation:
    return Expectation("not_null", column)


def accepted_values(column: str, values: list) -> Expectation:
    return Expectation("accepted_values", column, values=list(values))


def matches(column: str, pattern: str) -> Expectation:
    """Format check — e.g. the dataset-serial shape the reference asserts
    per row (cli_utils.py:4-41) becomes one vectorized rlike."""
    return Expectation("matches", column, pattern=pattern)


def in_range(column: str, lo: float | None = None, hi: float | None = None) -> Expectation:
    return Expectation("in_range", column, lo=lo, hi=hi)


def unique(column: str) -> Expectation:
    return Expectation("unique", column)


def foreign_key(column: str, ref: DataFrame, ref_column: str) -> Expectation:
    return Expectation("foreign_key", column, ref=ref, ref_column=ref_column)


def _row_violation(e: Expectation) -> F.Column:
    c = F.col(e.column)
    if e.kind == "not_null":
        return c.isNull()
    if e.kind == "accepted_values":
        return c.isNotNull() & ~c.isin(e.values)
    if e.kind == "matches":
        return c.isNotNull() & ~c.rlike(e.pattern)
    if e.kind == "in_range":
        v = F.lit(False)
        if e.lo is not None:
            v = v | (c < e.lo)
        if e.hi is not None:
            v = v | (c > e.hi)
        return c.isNotNull() & v
    raise ValueError(f"not a row-local rule: {e.kind}")


def check(df: DataFrame, expectations: list[Expectation]) -> list[dict]:
    """Evaluate all expectations; return one report dict per rule:
    {rule, violations, sample} — sample holds at most SAMPLE_K offending
    values/keys in a deterministic order. Row-local rules share ONE scan;
    each table-level rule adds exactly its own aggregate/anti-join."""
    reports: list[dict] = []
    row_local = [e for e in expectations if e.kind not in ("unique", "foreign_key")]
    if row_local:
        counts = df.agg(
            *[
                F.sum(_row_violation(e).cast("long")).alias(f"v{i}")
                for i, e in enumerate(row_local)
            ]
        ).collect()[0]
        for i, e in enumerate(row_local):
            n = counts[f"v{i}"] or 0
            sample = []
            if n:
                sample = [
                    r[e.column]
                    for r in df.filter(_row_violation(e))
                    .select(e.column)
                    .orderBy(F.col(e.column).asc_nulls_first())
                    .limit(SAMPLE_K)
                    .collect()
                ]
            reports.append({"rule": e.name, "violations": int(n), "sample": sample})
    for e in expectations:
        if e.kind == "unique":
            dupes = (
                df.groupBy(e.column)
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > 1)
            )
            rows = dupes.orderBy(e.column).limit(SAMPLE_K).collect()
            n = dupes.agg(F.coalesce(F.sum("n"), F.lit(0))).collect()[0][0]
            reports.append(
                {
                    "rule": e.name,
                    "violations": int(n),
                    "sample": [r[e.column] for r in rows],
                }
            )
        elif e.kind == "foreign_key":
            orphans = df.filter(F.col(e.column).isNotNull()).join(
                e.ref.select(F.col(e.ref_column).alias(e.column)).distinct(),
                e.column,
                "left_anti",
            )
            rows = (
                orphans.select(e.column)
                .orderBy(e.column)
                .limit(SAMPLE_K)
                .collect()
            )
            n = orphans.count()
            reports.append(
                {
                    "rule": f"foreign_key({e.column}→{e.ref_column})",
                    "violations": int(n),
                    "sample": [r[e.column] for r in rows],
                }
            )
    return reports


def assert_expectations(df: DataFrame, expectations: list[Expectation]) -> None:
    """The reference's assert-style surface on top of check(): raise with
    the full violation report when any rule fails — for ingest gates that
    must stop the pipeline (db_operations.py:111-117 semantics, but one
    batch-level raise instead of a per-row assert)."""
    bad = [r for r in check(df, expectations) if r["violations"]]
    if bad:
        raise AssertionError(f"expectations failed: {bad}")
