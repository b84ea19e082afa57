"""Deterministic sampling / dataset-split operators over `documents` —
training-data-pipeline surface (north-star: the operations a large-scale
pretraining pipeline needs beyond the reference's own API).

Both operators use CONTENT-ADDRESSED randomness: the md5 of a stable key,
compared as hex text. No RNG, no seed state, no shuffle — assignment is a
pure projection, so it is reproducible across engines (the DuckDB oracle
computes the identical md5), across runs, and across cluster sizes, and a
re-run after appending new documents never reassigns existing ones. That
last property is why production splits hash keys instead of calling
rand(): rand() splits are not stable under retries, repartitioning, or
incremental ingest.

Scale shape: zero shuffles for assignment (embarrassingly parallel
projection + filter, pushed to the scan); the only aggregation is the
per-split audit count, map-side partial as always.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from imagingdb_spark.catalog import table
from imagingdb_spark.registry import query

# hex-string thresholds: uniform md5 hex compared lexicographically.
# 2 hex chars = 256 buckets: '0d' = 13/256 ≈ 5% test, '1a' = next ≈5% val.
TEST_MAX = "0d"
VAL_MAX = "1a"


def split_col(key: Column) -> Column:
    """train/val/test assignment from the first 2 md5 hex chars of a stable
    key column (~5% test, ~5% val, 90% train)."""
    bucket = F.substring(F.md5(key), 1, 2)
    return (
        F.when(bucket < TEST_MAX, F.lit("test"))
        .when(bucket < VAL_MAX, F.lit("val"))
        .otherwise(F.lit("train"))
    )


@query(
    "x_split_hash",
    oracle=f"""
    SELECT doc_id,
           substr(md5('doc-' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
           CASE
             WHEN substr(md5('doc-' || CAST(doc_id AS VARCHAR)), 1, 2) < '{TEST_MAX}'
               THEN 'test'
             WHEN substr(md5('doc-' || CAST(doc_id AS VARCHAR)), 1, 2) < '{VAL_MAX}'
               THEN 'val'
             ELSE 'train'
           END AS split
    FROM documents
    """,
)
def x_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split: every document is assigned by
    hashing its id, never by rand() — stable under re-runs, retries, and
    incremental appends (new docs get splits; old docs keep theirs)."""
    d = table(spark, sf_dir, "documents")
    key = F.concat(F.lit("doc-"), F.col("doc_id").cast("string"))
    return d.select(
        "doc_id",
        F.substring(F.md5(key), 1, 2).alias("bucket"),
        split_col(key).alias("split"),
    )


@query(
    "x_sample_weighted",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang, source,
             substr(md5('smp-' || CAST(doc_id AS VARCHAR)), 1, 4) AS h4
      FROM documents
    )
    SELECT doc_id, lang, source
    FROM keyed
    WHERE h4 < (CASE WHEN lang = 'en' THEN '8000' ELSE 'ffff' END)
    """,
)
def x_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group weighted sampling (data mixing): keep ~50%
    of 'en' documents and 100% of every other language — the
    downsample-the-dominant-source step of corpus mixing, as a pure
    hash-threshold filter (4 hex chars = 65536 buckets; '8000' = 50%).
    Group weights are a CASE expression, so the plan is still a single
    pushed-down scan+filter with zero shuffles."""
    d = table(spark, sf_dir, "documents")
    h4 = F.substring(
        F.md5(F.concat(F.lit("smp-"), F.col("doc_id").cast("string"))), 1, 4
    )
    threshold = F.when(F.col("lang") == "en", F.lit("8000")).otherwise(F.lit("ffff"))
    return d.select("doc_id", "lang", "source", h4.alias("h4"), threshold.alias("t")).filter(
        F.col("h4") < F.col("t")
    ).select("doc_id", "lang", "source")


@query(
    "x_shard_shuffle",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, md5('shard-' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    )
    SELECT doc_id,
           substr(h, 1, 1) AS shard,
           CAST(row_number() OVER (PARTITION BY substr(h, 1, 1)
                                   ORDER BY h, doc_id) AS BIGINT)
             AS pos_in_shard
    FROM keyed
    """,
)
def x_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle into training shards — the step that
    fixes a pretraining dataloader's read order: shard = first md5 hex
    char (16 shards; widen the prefix for more), position within shard =
    rank of the full md5 (doc_id tiebreak). Content-addressed like every
    sampling op here: reproducible across engines/runs/cluster sizes, and
    appending docs never reorders existing shards' relative order.

    Scale shape: this is deliberately NOT row_number() over a global
    ORDER BY md5 — an unpartitioned window moves the whole corpus through
    ONE task (Spark even warns "No Partition Defined for Window").
    Partitioning the window by shard makes it one hash shuffle on the
    shard key plus a per-shard sort, fully parallel across shards — at
    100 TB you widen the shard prefix so each shard fits a task, which is
    exactly how shard files are sized in practice."""
    d = table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit("shard-"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        d.select("doc_id", h.alias("h"))
        .withColumn("shard", F.substring("h", 1, 1))
        .select(
            "doc_id",
            "shard",
            F.row_number().over(w).cast("bigint").alias("pos_in_shard"),
        )
    )
