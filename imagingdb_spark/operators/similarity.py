"""Similarity search over the `embeddings` table (SURVEY.md §2.10 D3 +
north-star ANN surface).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed variant
(random-hyperplane signatures) is the scale path — at 100 TB the bucketed
join prunes the candidate set to ~bucket-sized groups instead of scoring
every vector against every query.

All vector arithmetic uses higher-order array functions (zip_with /
aggregate) on DOUBLE — JVM-side, no Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from imagingdb_spark.catalog import table
from imagingdb_spark.registry import query

QUERY_VEC_ID = 0  # the probe vector for top-k queries
HYPERPLANES = 8  # LSH signature bits


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ via zip_with + aggregate (JVM, codegen)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(col: str) -> Column:
    # embeddings are float32 on disk; promote once so all arithmetic is f64
    # (matches the oracle's ::DOUBLE[] cast and avoids f32 rounding drift)
    return F.col(col).cast("array<double>")


@query(
    "x_topk_sim",
    oracle=f"""
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT e.vec_id, e.label,
           round(list_dot_product(e.embedding::DOUBLE[], q.qvec) /
                 (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                  sqrt(list_dot_product(q.qvec, q.qvec))), 4) AS cosine_sim
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> {QUERY_VEC_ID}
    ORDER BY cosine_sim DESC, e.vec_id ASC
    LIMIT 10
    """,
)
def x_topk_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: brute-force cosine top-k against one probe vector. The 1-row probe
    side is broadcast (explicitly — it is always tiny); scoring is a single
    embarrassingly-parallel pass and top-k is TakeOrderedAndProject, so no
    global sort materializes. This is the exact-recall baseline the ANN
    variant (x_ann_lsh) is measured against."""
    e = table(spark, sf_dir, "embeddings")
    probe = F.broadcast(
        e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
            _as_double("embedding").alias("qvec")
        )
    )
    scored = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(probe)
        .select(
            "vec_id",
            "label",
            F.round(cosine(_as_double("embedding"), F.col("qvec")), 4).alias(
                "cosine_sim"
            ),
        )
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc()).limit(10)


@query(
    "x_embed_stats",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vectors,
           round(AVG(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
             AS avg_norm,
           CAST(MIN(len(embedding)) AS INT) AS min_dim,
           CAST(MAX(len(embedding)) AS INT) AS max_dim
    FROM embeddings
    GROUP BY label
    """,
)
def x_embed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column profiling (norms, dimensionality) per label — the
    sanity pass a pipeline runs before indexing a new embedding batch."""
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select(
            "label",
            norm(_as_double("embedding")).alias("nrm"),
            F.size("embedding").alias("dim"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
            F.min("dim").alias("min_dim"),
            F.max("dim").alias("max_dim"),
        )
    )


EMBED_DUP_THRESHOLD = 0.4  # synthetic corpus max-cos ≈ 0.47; real pipelines use ~0.95


@query(
    "x_dedup_embed",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
           round(list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) *
                  sqrt(list_dot_product(b.v, b.v))), 4) AS cosine_sim
    FROM e a
    JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v) /
                (sqrt(list_dot_product(a.v, a.v)) *
                 sqrt(list_dot_product(b.v, b.v))), 4) >= {EMBED_DUP_THRESHOLD}
    """,
)
def x_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: within-label pairs with cosine >= threshold
    (exact, oracle-checked; the blocking key bounds the quadratic exactly
    like x_dedup_jaccard's (lang, source) block). The corpus-scale unblocked
    path is hyperplane-LSH bucketing (x_ann_lsh's signature as the block
    key). 64-float vectors are small enough to carry through the block join;
    the filter is on the ROUNDED value so both engines cut at the same
    boundary."""
    e = table(spark, sf_dir, "embeddings")
    vecs = e.select("vec_id", "label", _as_double("embedding").alias("v"))
    a = vecs.select(
        F.col("vec_id").alias("vec_a"), "label", F.col("v").alias("va")
    )
    b = vecs.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("v").alias("vb"),
    )
    return (
        a.join(
            b,
            (F.col("label") == F.col("label_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select(
            "vec_a",
            "vec_b",
            "label",
            F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= EMBED_DUP_THRESHOLD)
    )


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: components from a
    splitmix64-style integer scramble of (seed, i) mapped to [-1, 1).
    Pure-python constant — computed once on the driver, shipped as a literal
    (no RNG library dependence, reproducible everywhere)."""
    comps = []
    for i in range(dim):
        z = (seed * 0x9E3779B97F4A7C15 + i * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z ^= z >> 31
        comps.append((z / 2**63) - 1.0)
    return comps


@query("x_ann_lsh")  # rows-only: hyperplane-LSH not reasonably ANSI-SQL-expressible
def x_ann_lsh(spark: SparkSession, sf_dir: str, dim: int = 64) -> DataFrame:
    """ANN via random-hyperplane LSH: sign(v·hᵢ) bits → bucket key; probe and
    candidates equi-join on the bucket, cosine scored only within the
    bucket. Recall < 1 by construction; at scale the join replaces the full
    scan of x_topk_sim with bucket-local scoring. Multi-probe (flipping one
    signature bit) would raise recall — left single-probe here to keep the
    candidate set minimal."""
    e = table(spark, sf_dir, "embeddings")
    planes = [_hyperplane(dim, s) for s in range(HYPERPLANES)]

    def signature(vec: Column) -> Column:
        bits = [
            F.when(
                dot(vec, F.array(*[F.lit(c) for c in p])) >= 0, F.lit(1 << i)
            ).otherwise(F.lit(0))
            for i, p in enumerate(planes)
        ]
        return sum(bits[1:], bits[0]).cast("int")

    vecs = e.select(
        "vec_id", "label", _as_double("embedding").alias("v")
    ).withColumn("bucket", signature(F.col("v")))
    probe = F.broadcast(
        vecs.filter(F.col("vec_id") == QUERY_VEC_ID).select(
            F.col("v").alias("qvec"), F.col("bucket").alias("qbucket")
        )
    )
    cand = vecs.filter(F.col("vec_id") != QUERY_VEC_ID).join(
        probe, F.col("bucket") == F.col("qbucket")
    )
    return (
        cand.select(
            "vec_id",
            "label",
            F.round(cosine(F.col("v"), F.col("qvec")), 4).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )
