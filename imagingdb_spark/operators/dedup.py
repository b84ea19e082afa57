"""Deduplication operators over `documents` (SURVEY.md §2.10 D1/D2 +
north-star dedup surface): exact, n-gram Jaccard, MinHash, SimHash.

The reference's dedup primitives are the sha256 frame checksum
(frames.py:24, meta_utils.py:72-102) and the count-must-be-zero uniqueness
assert before insert (db_operations.py:111-117); these generalize to exact
content-hash dedup. Near-dup operators are the standard pretraining
pipeline: shingle → MinHash → LSH band bucketing → candidate join.

Scale design notes (the part that matters at 100 TB):
- exact dedup = groupBy(content_hash) with min(doc_id) as the keeper —
  one shuffle on a 32-byte key, map-side partial agg collapses duplicates
  early. Never dropDuplicates() without a deterministic keeper rule.
- MinHash/SimHash candidate generation joins on BAND key, never all-pairs.
  Band buckets are the classic skew hazard (an empty-ish shingle set hashes
  identically) — AQE skew-join handles moderate skew; degenerate docs are
  filtered before banding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imagingdb_spark.catalog import table
from imagingdb_spark.operators.text import tokens_col
from imagingdb_spark.registry import query

# MinHash parameters: 16 hashes = 4 bands x 4 rows. Deterministic seeds.
MINHASH_N = 16
MINHASH_BANDS = 4
SIMHASH_BITS = 32


@query(
    "x_dedup_exact",
    oracle="""
    SELECT sha256(text) AS content_hash,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY sha256(text)
    """,
)
def x_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: exact dedup by content hash with deterministic keeper (min doc_id).
    The `n_copies > 1` rows are the duplicate clusters; downstream keeps
    `keeper_doc_id`. Generalizes dropDuplicates([sha256]) with a
    deterministic survivor."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.sha2("text", 256).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "x_dedup_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, source,
             list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                                       t -> t <> '')) AS tokset
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.tokset, b.tokset)) /
                 (len(a.tokset) + len(b.tokset)
                  - len(list_intersect(a.tokset, b.tokset))), 4) AS jaccard
    FROM toks a
    JOIN toks b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.tokset, b.tokset)) /
          (len(a.tokset) + len(b.tokset)
           - len(list_intersect(a.tokset, b.tokset))) >= 0.8
    """,
)
def x_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2a: n-gram (unigram-set) Jaccard near-dup with blocking.

    All-pairs Jaccard is O(n²) and unusable at scale; pairing is restricted
    to a blocking key (lang, source) so the self-join is an equi-join whose
    quadratic cost is bounded per block. |A∪B| is computed as
    |A|+|B|-|A∩B| so the intersection is evaluated once per pair. For
    corpus-scale near-dup the LSH path (x_dedup_minhash) replaces blocking."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(tokens_col(F.col("text"))).alias("tokset"),
    )
    a, b = toks.alias("a"), toks.alias("b")
    inter = F.size(F.array_intersect(F.col("a.tokset"), F.col("b.tokset")))
    union = F.size(F.col("a.tokset")) + F.size(F.col("b.tokset")) - inter
    jac = inter / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.8)
    )


def _minhash_signature() -> F.Column:
    """MINHASH_N-element MinHash signature over the token set, built from
    Spark's 64-bit xxhash64 with per-hash seeds — all JVM expressions.

    min over tokens of xxhash64(token, seed_i) approximates a random
    permutation per seed (standard MinHash construction)."""
    toks = F.array_distinct(tokens_col(F.col("text")))

    def one_hash(seed: int) -> F.Column:
        # single-arg lambda: a 2-arg transform lambda would receive the
        # element index as its second argument and shadow the seed
        return F.array_min(F.transform(toks, lambda t: F.xxhash64(t, F.lit(seed))))

    return F.array(*[one_hash(i) for i in range(MINHASH_N)])


@query("x_dedup_minhash")  # rows-only: LSH banding is not ANSI-SQL-expressible
def x_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2b: MinHash + LSH banded near-dup candidates.

    Pipeline: token set → 16-hash MinHash signature → 4 bands of 4 hashes →
    hash each band → candidate pairs = docs sharing any band bucket →
    verified with true Jaccard >= 0.5. The only shuffle is the equi-join on
    (band_idx, band_hash); signature computation is embarrassingly parallel.
    This is the scale path for near-dup at 100 TB (pair count ~ bucket
    collisions, not n²)."""
    d = table(spark, sf_dir, "documents")
    sig = d.select(
        "doc_id",
        F.array_distinct(tokens_col(F.col("text"))).alias("tokset"),
        _minhash_signature().alias("sig"),
    ).filter(F.size("tokset") > 0)

    rows_per_band = MINHASH_N // MINHASH_BANDS
    bands = sig.select(
        "doc_id",
        "tokset",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.xxhash64(
                            *[F.col("sig").getItem(b * rows_per_band + r) for r in range(rows_per_band)]
                        ).alias("band_hash"),
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "tokset", "band.band_idx", "band.band_hash")

    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.tokset").alias("tokset_a"),
            F.col("b.tokset").alias("tokset_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect("tokset_a", "tokset_b"))
    union = F.size("tokset_a") + F.size("tokset_b") - inter
    return (
        cand.select(
            "doc_a", "doc_b", F.round(inter / union, 4).alias("jaccard")
        )
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


@query("x_dedup_simhash")  # rows-only: bit-manipulation not ANSI-SQL-expressible
def x_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2c: SimHash near-dup. Each token votes its hash bits ±1; the signed
    bit-sums collapse to a SIMHASH_BITS fingerprint. Candidate pairs =
    identical fingerprint prefix (16-bit block), verified by Hamming
    distance <= 3. All bit arithmetic is JVM-side (shiftright/bitwise)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
    h = F.xxhash64("tok")
    # per (doc, bit): +1 if bit set else -1; summed, then sign → bit
    bit_votes = toks.select(
        "doc_id",
        *[
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias(f"b{i}")
            for i in range(SIMHASH_BITS)
        ],
    )
    votes = bit_votes.groupBy("doc_id").agg(
        *[F.sum(f"b{i}").alias(f"b{i}") for i in range(SIMHASH_BITS)]
    )
    simhash = votes.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
                for i in range(SIMHASH_BITS)
            ],
            F.lit(0),
        ).cast("bigint").alias("simhash"),
    )
    prefix = F.shiftright(F.col("simhash"), SIMHASH_BITS // 2)
    keyed = simhash.select("doc_id", "simhash", prefix.alias("prefix"))
    a, b = keyed.alias("a"), keyed.alias("b")
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    hamming = F.bit_count(xor)
    return (
        a.join(
            b,
            (F.col("a.prefix") == F.col("b.prefix"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    )
