"""Set operators (SURVEY.md §2.7) — none exist in the reference; the closest
is the vertical union of per-file frame metadata (ometif_splitter.py:194-197,
`frames_meta.append(file_meta)`), which is ``unionByName``.

Union is metadata-only (no shuffle); EXCEPT/INTERSECT are distinct-ifying
and shuffle on the full row — at scale prefer the semi/anti-join forms on a
key (see joins.j_semi / filters.f_not_exists) which shuffle only the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imagingdb_spark.catalog import table
from imagingdb_spark.registry import query


@query(
    "s_union",
    oracle="""
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 4) AS totalprice
    FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 4) AS totalprice
    FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 100000
    """,
)
def s_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName of two filtered subsets (by-name, not positional — the
    reference's pandas append matches on column names)."""
    orders = table(spark, sf_dir, "orders")
    proj = lambda df: df.select(  # noqa: E731
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 4).alias("totalprice")
    )
    a = proj(orders.filter(F.col("o_orderstatus") == "F"))
    b = proj(orders.filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000)))
    return a.unionByName(b)


@query(
    "s_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def s_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — 'which manifest entries are not yet in the DB'
    (SURVEY §2.7). The anti-join form of the same check is f_not_exists."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    ordered = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    # subtract == EXCEPT DISTINCT (exceptAll is the multiset variant)
    return cust.subtract(ordered)


@query(
    "s_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def s_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): nations having both customers and suppliers."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)
