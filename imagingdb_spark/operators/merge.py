"""MERGE INTO / upsert semantics (SURVEY.md §2.11 S10): apply a change
batch (updates + inserts) to a keyed corpus in one pass — the Delta-Lake
``MERGE INTO`` shape re-expressed as a full-outer join, which is exactly
how Delta/Iceberg execute it underneath.

The reference's relational sink is append-only with uniqueness asserts
(db_operations.py:111-117, 150-274 — insert or reject); a training-data
corpus additionally needs *revise in place* (re-crawled pages, fixed OCR,
re-scored quality) without rewriting untouched rows' lineage. That is
this operator.

Scale shape: one shuffle on the key for each side of the full-outer join
(Spark cannot broadcast a full-outer side, and for MERGE that is correct
anyway — both sides must be complete). At 100 TB the standard upgrade is
to bucket the corpus by key so only the change batch shuffles; the
semantics below are unchanged by that. AQE handles the skew. No window,
no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imagingdb_spark.catalog import table
from imagingdb_spark.registry import query

INSERT_ID_OFFSET = 10_000_000  # synthetic new-doc key space for the demo batch


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """Generic SCD-1 merge: rows of ``source`` replace same-``key`` rows of
    ``target``; unmatched source rows are inserts; unmatched target rows
    pass through. Adds an ``action`` column ('update'/'insert'/'keep').
    Both frames must share the same non-key column set."""
    cols = [c for c in target.columns if c != key]
    if set(source.columns) != set(target.columns):
        raise ValueError("merge_upsert: target/source schemas must match")
    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    action = (
        F.when(
            F.col(f"s.{key}").isNotNull() & F.col(f"t.{key}").isNotNull(),
            F.lit("update"),
        )
        .when(F.col(f"s.{key}").isNotNull(), F.lit("insert"))
        .otherwise(F.lit("keep"))
    )
    return joined.select(
        F.coalesce(F.col(f"s.{key}"), F.col(f"t.{key}")).alias(key),
        *[F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c) for c in cols],
        action.alias("action"),
    )


@query(
    "x_merge_upsert",
    oracle=f"""
    WITH upd AS (
      SELECT doc_id, text || ' [rev2]' AS text
      FROM documents
      WHERE substr(md5('upd-' || CAST(doc_id AS VARCHAR)), 1, 1)
              IN ('0', '1', '2', '3')
    ), ins AS (
      SELECT doc_id + {INSERT_ID_OFFSET} AS doc_id,
             'fresh crawl ' || CAST(doc_id AS VARCHAR) AS text
      FROM documents
      WHERE substr(md5('ins-' || CAST(doc_id AS VARCHAR)), 1, 1) = '0'
    ), src AS (
      SELECT * FROM upd UNION ALL SELECT * FROM ins
    )
    SELECT COALESCE(s.doc_id, t.doc_id) AS doc_id,
           CAST(length(COALESCE(s.text, t.text)) AS BIGINT) AS n_chars,
           CASE WHEN s.doc_id IS NOT NULL AND t.doc_id IS NOT NULL
                  THEN 'update'
                WHEN s.doc_id IS NOT NULL THEN 'insert'
                ELSE 'keep' END AS action
    FROM documents t FULL OUTER JOIN src s ON t.doc_id = s.doc_id
    """,
)
def x_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE a deterministic change batch into the documents corpus:
    ~25% of docs revised (md5('upd-'||doc_id) slice — content-addressed,
    so the batch is identical on both engines), ~6% brand-new docs in a
    disjoint key space. Output is the merged corpus keyed by doc_id with
    the per-row action, projected to (doc_id, n_chars, action) so the
    oracle hash stays text-order-free."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    h = lambda prefix: F.substring(  # noqa: E731
        F.md5(F.concat(F.lit(prefix), F.col("doc_id").cast("string"))), 1, 1
    )
    upd = d.filter(h("upd-").isin("0", "1", "2", "3")).select(
        "doc_id", F.concat("text", F.lit(" [rev2]")).alias("text")
    )
    ins = d.filter(h("ins-") == "0").select(
        (F.col("doc_id") + INSERT_ID_OFFSET).alias("doc_id"),
        F.concat(F.lit("fresh crawl "), F.col("doc_id").cast("string")).alias("text"),
    )
    merged = merge_upsert(d, upd.unionAll(ins), key="doc_id")
    return merged.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        "action",
    )
