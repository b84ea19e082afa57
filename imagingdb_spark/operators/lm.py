"""Statistical language-model scoring over the `documents` table
(SURVEY.md §2.11 D17/D18): corpus unigram LM → per-document mean token
log-probability (the CCNet / Wenzek et al. 2020 quality-scoring family,
with the KenLM swapped for the corpus's own unigram model), and TF-IDF
term ranking per document.

Both operators share the whitespace token definition of text.py
(``tokens_col``) and both are two-aggregate + one-join pipelines whose
shuffle volume is VOCABULARY-sized, not corpus-sized: per-doc term counts
partial-aggregate map-side, the term-statistics table (unigram counts /
document frequencies) is tiny relative to the corpus, and the final score
join is a plain equi-join on the token that AQE will broadcast whenever
the vocabulary fits (at 100 TB a natural-language vocabulary is still
millions of rows — megabytes — so the broadcast holds).

Reference scope: the reference has no LM scoring (it is an imaging
database); these are north-star training-data-pipeline operators, same
family as text.py's quality/repetition filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from imagingdb_spark.catalog import table
from imagingdb_spark.operators.text import tokens_col
from imagingdb_spark.registry import query


def doc_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tok, c): per-document term counts — the shared first stage,
    returned PERSISTED because both consumers feed multiple aggregates off
    it (Spark has no automatic subplan sharing; without the persist each
    aggregate re-scans and re-explodes the whole corpus — 3 corpus passes
    instead of 1 at 100 TB). Callers running many queries in one session
    must spark.catalog.clearCache() between queries (bench.py and
    tools/selfcheck.py already do — same contract as dedup.py's shingle
    table). explode happens map-side; the groupBy partial-aggregates
    before the shuffle, so shuffle rows = Σ per-doc distinct terms."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )


def attach_scalar(df: DataFrame, scalar: DataFrame) -> DataFrame:
    """Attach a 1-row aggregate to every row of ``df`` via a broadcast.

    Written as an equi-join on a literal key, but Catalyst constant-folds
    the key away and the physical plan is a BroadcastNestedLoopJoin with a
    1-row build side (see tools/plans/x_tfidf.txt, x_unigram_logprob.txt)
    — identical cost to a broadcast hash join here, since the build side
    is a single row. explain_audit's ``_bnlj_all_scalar`` allowlists
    exactly this shape; a bare ``crossJoin`` would produce the same plan."""
    k = "__one"
    return df.withColumn(k, F.lit(1)).join(
        F.broadcast(scalar.withColumn(k, F.lit(1))), k
    ).drop(k)


@query(
    "x_unigram_logprob",
    oracle="""
    WITH dt AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  t -> t <> '')) AS tok
        FROM documents
      )
      GROUP BY doc_id, tok
    ), v AS (
      SELECT tok, CAST(SUM(c) AS BIGINT) AS cnt FROM dt GROUP BY tok
    ), tot AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM v
    )
    SELECT dt.doc_id,
           CAST(SUM(dt.c) AS BIGINT) AS n_tokens,
           round(SUM(dt.c * ln(v.cnt / tot.total)) / SUM(dt.c), 4) + 0.0
             AS avg_logprob
    FROM dt JOIN v USING (tok) CROSS JOIN tot
    GROUP BY dt.doc_id
    """,
)
def x_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean token log-probability under the corpus's own
    unigram LM — the CCNet-style perplexity quality signal (docs with very
    low mean logprob are gibberish/boilerplate outliers; Wenzek et al.
    2020, public). Deterministic and oracle-exact: ln(cnt/total) is the
    same double on both engines, and the per-doc weighted mean is rounded
    to 4 decimals.

    Plan shape: ONE corpus pass — the persisted per-doc term-count table
    feeds the vocabulary aggregate, the total-token scalar, and the score
    join, so the corpus parquet is scanned exactly once. The unigram
    table `v` is a vocabulary-sized aggregate; the scalar total rides a
    constant-key broadcast hash join; the score join is a tok-equi-join
    (AQE broadcasts the vocab side when it fits). No global sort, no
    window."""
    dt = doc_term_counts(spark, sf_dir)
    v = dt.groupBy("tok").agg(F.sum("c").alias("cnt"))
    total = dt.agg(F.sum("c").cast("double").alias("total"))
    return (
        attach_scalar(dt.join(v, "tok"), total)
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            (
                F.round(
                    F.sum(F.col("c") * F.log(F.col("cnt") / F.col("total")))
                    / F.sum("c"),
                    4,
                )
                + 0.0
            ).alias("avg_logprob"),
        )
    )


TFIDF_TOP_K = 3


@query(
    "x_tfidf",
    oracle=f"""
    WITH dt AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  t -> t <> '')) AS tok
        FROM documents
      )
      GROUP BY doc_id, tok
    ), dl AS (
      SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS n_tok FROM dt GROUP BY doc_id
    ), df AS (
      SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM dt GROUP BY tok
    ), n AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM dl
    ), scored AS (
      SELECT dt.doc_id, dt.tok,
             (dt.c / dl.n_tok) * ln(n.n_docs / df.df) AS score
      FROM dt JOIN dl USING (doc_id) JOIN df USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, CAST(rk AS INT) AS rk,
           round(score, 4) + 0.0 AS tfidf
    FROM (
      SELECT doc_id, tok, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, tok ASC) AS rk
      FROM scored
    )
    WHERE rk <= {TFIDF_TOP_K}
    """,
)
def x_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TFIDF_TOP_K} TF-IDF terms per document — the classic
    keyword-extraction / retrieval-indexing op. tf = c / doc_len,
    idf = ln(N / df). The rank is computed on the RAW double (identical
    arithmetic both engines — ties are structural, i.e. same (c, len, df),
    so the `tok ASC` tiebreak resolves them identically); rounding to 4
    decimals happens only in the projection.

    Plan shape: ONE corpus pass (the persisted term-count table), then
    document frequency and doc length as WINDOW aggregates over it — no
    second table materialization, no join-backs: one exchange on tok (df
    window), one on doc_id (doc-length window), and the top-k row_number
    window REUSES the doc_id partitioning (same partition key → no third
    exchange, just an in-partition sort). The doc-count scalar rides a
    constant-key broadcast hash join. Never a global sort."""
    dt = doc_term_counts(spark, sf_dir)
    n = dt.agg(F.countDistinct("doc_id").cast("double").alias("n_docs"))
    w_tok = Window.partitionBy("tok")
    w_doc = Window.partitionBy("doc_id")
    scored = attach_scalar(
        dt.withColumn("df", F.count(F.lit(1)).over(w_tok).cast("double"))
        .withColumn("n_tok", F.sum("c").over(w_doc).cast("double")),
        n,
    ).select(
        "doc_id",
        "tok",
        ((F.col("c") / F.col("n_tok")) * F.log(F.col("n_docs") / F.col("df"))).alias(
            "score"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOP_K)
        .select(
            "doc_id",
            "tok",
            F.col("rk").cast("int").alias("rk"),
            (F.round("score", 4) + 0.0).alias("tfidf"),
        )
    )
