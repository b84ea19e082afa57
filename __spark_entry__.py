"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query on /root/testdata/sf0.001 (smoke check).
- ``queries()``: every implemented operator from SURVEY.md §2 as
  ``(spark, sf_dir) -> DataFrame``.
- ``oracle_sql()``: DuckDB ANSI-SQL twin per query (same column names —
  the driver sorts columns by name before hashing values).

All implementations live in the ``imagingdb_spark`` package; this module
only adapts the registry to the driver's calling convention.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imagingdb_spark import registry

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue-by-nation-and-year over the full star — touches
    scan, pushed-down filters, broadcast dim joins, aggregation, and sort in
    one plan (the reference's J1 three-way join + A4 grouped summary shape,
    db_operations.py:311-314 + file_splitter.py:127-148)."""
    # nanosAsLong must be set before any parquet read; the driver's session
    # may not have it, so set it here (it is a runtime-settable SQL conf).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    sf_dir = "/root/testdata/sf0.001"
    from imagingdb_spark.catalog import table

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    region = F.broadcast(table(spark, sf_dir, "region"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name", F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy("r_name", "n_name", "order_year")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def with_conf(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
            return fn(spark, sf_dir)

        return wrapped

    return {name: with_conf(fn) for name, fn in registry.ordered_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin per query; rows-only ops are intentionally absent.
    Same priority order as queries() (the driver checks the first ~50)."""
    return {
        name: registry.ORACLE[name]
        for name in registry.ordered_queries()
        if name in registry.ORACLE
    }
