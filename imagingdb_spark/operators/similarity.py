"""Similarity search over the `embeddings` table (SURVEY.md §2.10 D3 +
north-star ANN surface).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed variant
(random-hyperplane signatures) is the scale path — at 100 TB the bucketed
join prunes the candidate set to ~bucket-sized groups instead of scoring
every vector against every query.

Execution-strategy note (measured at sf0.1, local[32]) — three ways to do
64-dim vector math in Spark, and why this module uses Arrow + numpy:

1. Higher-order functions (zip_with/aggregate): one plan node, but the
   lambdas are INTERPRETED — ~1 µs per element-op. Fine linearly, fatal on
   a pair join (x_dedup_embed measured 48 s).
2. Unrolled element_at expressions: whole-stage codegen, ~50x faster per
   element-op, but the 64-term-per-dot expression trees grow to 10³-10⁴
   nodes and Catalyst re-analyzes them on every run — plan time dominated
   end-to-end (x_ann_lsh's 8-plane signature alone is ~2.5k nodes, 3-6 s
   of driver time per invocation).
3. Arrow-batched numpy (pandas_udf / applyInPandas): one plan node, BLAS
   execution, one Arrow hop. Wins for every vector op here; the whole
   family runs in O(0.5 s) at sf0.1.

The lesson generalizes: "UDFs are the slow path" applies to per-ROW Python,
not to Arrow-vectorized batch math over fixed-width numeric arrays.
`dot`/`cosine` (HOF form) are kept for ad-hoc unknown-dim use.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from imagingdb_spark.catalog import table
from imagingdb_spark.registry import query

QUERY_VEC_ID = 0  # the probe vector for top-k queries
HYPERPLANES = 8  # LSH signature bits


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ via zip_with + aggregate. Works for any dim with a 1-node
    plan, but higher-order lambdas are interpreted — keep off hot paths
    (see module docstring)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def embedding_dim(df: DataFrame, col: str = "embedding") -> int:
    """The table's constant embedding dimensionality, read from one row at
    plan-build time (a LIMIT-1 scan of one column — negligible even at
    100 TB)."""
    row = df.select(F.size(col).alias("d")).limit(1).collect()
    return int(row[0]["d"]) if row else 0


def _collect_probe(e: DataFrame) -> np.ndarray:
    """The single probe vector, collected driver-side (1 row — the same
    boundary the reference crosses for its `.one()` point lookups)."""
    row = e.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").collect()
    return np.asarray(row[0]["embedding"], dtype=np.float64)


def _cosine_vs_probe_udf(qvec: np.ndarray):
    """pandas_udf scoring a batch of vectors against one probe: a single
    BLAS matvec per Arrow batch."""
    qn = float(np.sqrt(qvec @ qvec))

    @F.pandas_udf("double")
    def score(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64, copy=False)
        sims = (m @ qvec) / (np.sqrt((m * m).sum(axis=1)) * qn)
        return pd.Series(sims)

    return score


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
    """D3: brute-force cosine top-k against one probe vector. Scoring is one
    Arrow-vectorized matvec per batch (embarrassingly parallel, scales
    linearly with executors); top-k is TakeOrderedAndProject, so no global
    sort materializes. This is the exact-recall baseline the ANN variant
    (x_ann_lsh) is measured against."""
    e = table(spark, sf_dir, "embeddings")
    score = _cosine_vs_probe_udf(_collect_probe(e))
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id", "label", F.round(score("embedding"), 4).alias("cosine_sim")
        )
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


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

    @F.pandas_udf("double")
    def l2(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64, copy=False)
        return pd.Series(np.sqrt((m * m).sum(axis=1)))

    e = table(spark, sf_dir, "embeddings")
    return (
        e.select("label", l2("embedding").alias("nrm"), F.size("embedding").alias("dim"))
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
    (exact, oracle-checked; the label is the blocking key, bounding the
    quadratic exactly like x_dedup_jaccard's (lang, source) block).

    Shape: applyInPandas per label — ONE shuffle of the vectors (grouped by
    label), then each block scores itself with a single BLAS gram matrix
    (D = M Mᵀ, divided by the norm outer product: the same
    dot/(na·nb) formula as the oracle). Pairs never ride a join; only
    above-threshold pairs are emitted. An earlier all-JVM pair-join version
    measured 48 s (interpreted HOF scoring) and ~5 s (unrolled codegen);
    this is <1 s at sf0.1.

    At 100 TB a single label can exceed one task: the production layout
    splits each label into tiles and scores tile pairs (same gram-matrix
    kernel per tile pair); LSH bucketing (x_ann_lsh's signature as a
    sub-blocking key) is the recall-tradeoff alternative."""
    e = table(spark, sf_dir, "embeddings")

    def block(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(
                {"vec_a": [], "vec_b": [], "label": [], "cosine_sim": []}
            ).astype(
                {"vec_a": "int64", "vec_b": "int64", "label": "int32",
                 "cosine_sim": "float64"}
            )
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64, copy=False)
        n = np.sqrt((m * m).sum(axis=1))
        sims = (m @ m.T) / np.outer(n, n)
        ia, ib = np.triu_indices(len(pdf), k=1)
        # conservative pre-filter on the RAW cosine; the exact HALF_UP
        # round + threshold happens in Spark below so the cut matches the
        # oracle bit-for-bit (np.round is banker's rounding — not the same)
        keep = sims[ia, ib] >= EMBED_DUP_THRESHOLD - 5e-5 - 1e-12
        ids = pdf["vec_id"].to_numpy()
        return pd.DataFrame(
            {
                "vec_a": ids[ia[keep]],
                "vec_b": ids[ib[keep]],
                "label": np.full(int(keep.sum()), pdf["label"].iloc[0]),
                "cosine_sim": sims[ia[keep], ib[keep]],
            }
        )

    pairs = e.groupBy("label").applyInPandas(
        block, "vec_a long, vec_b long, label int, cosine_sim double"
    )
    return pairs.select(
        "vec_a", "vec_b", "label", F.round("cosine_sim", 4).alias("cosine_sim")
    ).filter(F.col("cosine_sim") >= EMBED_DUP_THRESHOLD)


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: components from a
    splitmix64-style integer scramble of (seed, i) mapped to [-1, 1).
    Pure-python constant — computed once on the driver, shipped inside the
    UDF closure (no RNG library dependence, reproducible everywhere)."""
    comps = []
    for i in range(dim):
        z = (seed * 0x9E3779B97F4A7C15 + i * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z ^= z >> 31
        comps.append((z / 2**63) - 1.0)
    return comps


def _plane_matrix(dim: int) -> np.ndarray:
    return np.asarray(
        [_hyperplane(dim, s) for s in range(HYPERPLANES)], dtype=np.float64
    )


def _signature_udf(planes: np.ndarray):
    """pandas_udf: sign(v·hᵢ) bits packed into an int bucket key — one
    (n, dim) @ (dim, HYPERPLANES) matmul per Arrow batch."""
    weights = (1 << np.arange(planes.shape[0])).astype(np.int64)

    @F.pandas_udf("int")
    def sig(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64, copy=False)
        bits = (m @ planes.T) >= 0
        return pd.Series((bits @ weights).astype(np.int32))

    return sig


@query("x_ann_lsh")  # rows-only: hyperplane-LSH not reasonably ANSI-SQL-expressible
def x_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: sign(v·hᵢ) bits → bucket key; probe and
    candidates equi-join on the bucket, cosine scored only within the
    bucket. Recall < 1 by construction; at scale the bucket equi-join
    replaces the full scan of x_topk_sim with bucket-local scoring.
    Multi-probe (flipping one signature bit) would raise recall — left
    single-probe here to keep the candidate set minimal."""
    e = table(spark, sf_dir, "embeddings")
    dim = embedding_dim(e)
    planes = _plane_matrix(dim)
    qvec = _collect_probe(e)
    qbits = (planes @ qvec) >= 0
    qbucket = int((qbits @ (1 << np.arange(HYPERPLANES))).astype(np.int64))
    score = _cosine_vs_probe_udf(qvec)
    sig = _signature_udf(planes)
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("bucket", sig("embedding"))
        .filter(F.col("bucket") == F.lit(qbucket))
        .select(
            "vec_id", "label", F.round(score("embedding"), 4).alias("cosine_sim")
        )
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )
