"""Sort / limit / top-k operators (SURVEY.md §2.6).

Spark's ORDER BY is a range-partitioned distributed sort (sampled split
points), so a global sort scales; ORDER BY + LIMIT k is optimized to
TakeOrderedAndProject — each partition keeps its top-k, the driver merges —
no full sort ever materializes. Every LIMIT here carries a unique tiebreaker
so results are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imagingdb_spark.catalog import table
from imagingdb_spark.registry import query


@query(
    "o_sort",
    oracle="""
    SELECT c_custkey, c_mktsegment, round(c_acctbal, 4) AS acctbal
    FROM customer
    ORDER BY c_mktsegment ASC, acctbal DESC, c_custkey ASC
    """,
)
def o_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: multi-column ORDER BY (get_datasets always sorts by serial —
    db_operations.py:68-69)."""
    return (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment", F.round("c_acctbal", 4).alias("acctbal"))
        .orderBy(F.col("c_mktsegment").asc(), F.col("acctbal").desc(), F.col("c_custkey").asc())
    )


@query(
    "o_limit",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 4) AS totalprice
    FROM orders
    ORDER BY totalprice DESC, o_orderkey ASC
    LIMIT 1
    """,
)
def o_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: `.first()` after filters (database_queries.ipynb cell 19) — a
    fully-ordered LIMIT 1 (TakeOrderedAndProject, no global sort)."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", F.round("o_totalprice", 4).alias("totalprice"))
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey").asc())
        .limit(1)
    )


@query(
    "o_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS totalprice
    FROM orders
    ORDER BY totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def o_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: top-k. Per-partition heaps + driver merge — k rows per partition
    cross the wire, not the table."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("totalprice"))
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "o_natural_sort",
    oracle="""
    SELECT file_name, file_seq
    FROM (
      SELECT printf('im_%d.tif', l_orderkey) AS file_name,
             CAST(regexp_extract(printf('im_%d.tif', l_orderkey), '(\\d+)', 1) AS BIGINT)
               AS file_seq
      FROM lineitem
      WHERE l_linenumber = 1
    )
    ORDER BY file_seq, file_name
    """,
)
def o_natural_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: natural sort — `natsort.natsorted(paths)` over tiff filenames
    (tiffolder_splitter.py:168-170). Lexicographic 'im_10.tif' < 'im_2.tif'
    is wrong; sorting by the regex-extracted integer key reproduces natsort
    for the single-number filename shapes the reference globs."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    named = li.select(
        F.format_string("im_%d.tif", F.col("l_orderkey")).alias("file_name")
    )
    return (
        named.select(
            "file_name",
            F.regexp_extract("file_name", r"(\d+)", 1).cast("bigint").alias("file_seq"),
        )
        .orderBy("file_seq", "file_name")
    )
