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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from imagingdb_spark.catalog import table
from imagingdb_spark.operators.text import tokens_col
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


MIX_BUCKETS = 65536  # 4 md5 hex chars of sampling resolution


@query(
    "x_domain_mix",
    oracle=f"""
    WITH c AS (
      SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang
    ), m AS (
      SELECT MIN(c) AS cmin FROM c
    ), r AS (
      SELECT c.lang,
             CAST(floor(sqrt(CAST(m.cmin AS DOUBLE) / c.c) * {MIX_BUCKETS})
                  AS BIGINT) AS thr
      FROM c CROSS JOIN m
    )
    SELECT d.doc_id, d.lang, d.source, r.thr
    FROM documents d JOIN r USING (lang)
    WHERE '0' || substr(md5('mix-' || CAST(d.doc_id AS VARCHAR)), 1, 4)
          < printf('%05x', r.thr)
    """,
)
def x_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-reweighted domain mixing (the Pile / DoReMi-family
    corpus-mixing step, public): downsample each language toward a
    temperature-alpha=0.5 mixture. Keep rate per language is
    sqrt(c_min / c_lang) — the resulting mixture is proportional to
    sqrt(share), normalized so the RAREST language is kept in full.

    Determinism: the rate formula is deliberately SUM-FREE — normalizing
    by a sum of per-language weights would hang the result on float
    summation order; min/max are order-insensitive, integer counts are
    exact, division and sqrt are IEEE-exact, so both engines compute
    bit-identical rates. The rate becomes an integer md5-bucket threshold
    rendered as FIVE lowercase hex chars (rate 1.0 → '10000' must sort
    ABOVE every 4-char sample, so samples are zero-padded to 5), keeping
    the whole filter in exact string/integer arithmetic — the same
    content-addressed pattern as x_split_hash/x_sample_weighted.

    Scale shape: the language histogram is a tiny aggregate (map-side
    partial); rates broadcast back; assignment is a pure projection +
    filter — zero corpus shuffles, append-stable, reproducible across
    engines, runs, and cluster sizes."""
    d = table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    m = c.agg(F.min("c").alias("cmin"))
    r = c.crossJoin(F.broadcast(m)).select(
        "lang",
        F.floor(
            F.sqrt(F.col("cmin").cast("double") / F.col("c")) * MIX_BUCKETS
        )
        .cast("bigint")
        .alias("thr"),
    )
    h5 = F.concat(
        F.lit("0"),
        F.substring(
            F.md5(F.concat(F.lit("mix-"), F.col("doc_id").cast("string"))), 1, 4
        ),
    )
    return (
        d.join(F.broadcast(r), "lang")
        .filter(h5 < F.format_string("%05x", F.col("thr")))
        .select("doc_id", "lang", "source", "thr")
    )


TOKEN_BUDGET = 10_000   # tokens to select at any SF (≈37% of sf0.01 corpus)
BUDGET_BUCKETS = 50     # score-quantile buckets for the two-pass selection


@query(
    "x_token_budget",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) / len(toks) AS score
      FROM (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> t <> '') AS toks
        FROM documents
      )
      WHERE len(toks) > 0
    ), w AS (
      SELECT doc_id, n_tokens, score,
             SUM(n_tokens) OVER (ORDER BY score DESC, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM s
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, score
    FROM w WHERE cum <= {TOKEN_BUDGET}
    """,
)
def x_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: keep the highest-quality documents
    (quality = distinct-token ratio, doc_id tiebreak) until a fixed token
    budget is exhausted — the data-selection step that turns "we can only
    train on N tokens" into a concrete corpus. A document is kept iff its
    inclusive running token total, in (score DESC, doc_id) order, stays
    within the budget.

    Scale shape: the oracle's global ORDER BY + running sum would move
    the whole corpus through ONE task in Spark, so the implementation is
    the two-pass equivalent: (1) quantize scores into {BUDGET_BUCKETS}+1
    ordered buckets and aggregate per-bucket token sums — a tiny shuffle;
    (2) the driver prefix-sums the ≤{BUDGET_BUCKETS}+1 bucket rows (a
    scalar-sized collect, same documented boundary as graph.py's
    convergence scalar) to classify each bucket as fully-kept,
    fully-dropped, or THE single boundary bucket; (3) only the boundary
    bucket — ~1/{BUDGET_BUCKETS} of the corpus — runs a within-bucket
    running-sum window seeded with the preceding buckets' exact total.
    Bucket boundaries respect the score order, and ties can't straddle
    buckets (equal scores share a bucket), so the result is IDENTICAL to
    the single-window semantics. At larger scale, widen BUDGET_BUCKETS or
    recurse the same trick inside the boundary bucket.

    Determinism: score is an exact integer ratio, token counts are
    integers, and the running sums are integer — no float aggregation
    anywhere."""
    d = table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    s = d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("score"),
    ).filter(F.col("n_tokens") > 0)
    s = s.withColumn(
        "bucket", F.floor(F.col("score") * BUDGET_BUCKETS).cast("int")
    ).persist()
    # pass 1: per-bucket token totals, prefix-summed on the driver
    btab = (
        s.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("btok"))
        .orderBy(F.col("bucket").desc())
        .collect()
    )
    full, boundary, prefix = [], None, 0
    for row in btab:
        if prefix + row["btok"] <= TOKEN_BUDGET:
            full.append(row["bucket"])
            prefix += row["btok"]
        else:
            boundary, boundary_prefix = row["bucket"], prefix
            break
    out = s.filter(F.col("bucket").isin(full)) if full else None
    if boundary is not None:
        w = Window.partitionBy("bucket").orderBy(
            F.col("score").desc(), F.col("doc_id")
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        part = (
            s.filter(F.col("bucket") == boundary)
            .withColumn("cum", F.sum("n_tokens").over(w) + F.lit(boundary_prefix))
            .filter(F.col("cum") <= TOKEN_BUDGET)
            .drop("cum")
        )
        out = part if out is None else out.unionByName(part)
    if out is None:  # budget smaller than the first doc, or empty corpus
        out = s.limit(0)
    return out.select(
        "doc_id", F.col("n_tokens").cast("bigint").alias("n_tokens"), "score"
    )


STRATA_N = 20  # fixed sample size per language


@query(
    "x_stratified",
    oracle=f"""
    SELECT doc_id, lang, rk
    FROM (
      SELECT doc_id, lang,
             CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('strat-' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS BIGINT) AS rk
      FROM documents
    )
    WHERE rk <= {STRATA_N}
    """,
)
def x_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified fixed-count sampling: exactly {STRATA_N} documents per
    language (fewer if the stratum is smaller), selected by
    content-addressed rank — the eval-set construction op ("200 examples
    per language, stable across reruns"). Hash-rank, not rand(): the
    sample is reproducible across engines/runs and only churns minimally
    under appends (a new doc displaces at most one sampled doc of its own
    stratum).

    Scale shape: the same per-group top-k window as w_topk_group — one
    shuffle on the stratum key, per-partition sort, early filter. Group
    skew (one giant stratum) is the known hazard; the mitigation is
    implemented and equivalence-tested as ``capped_hash_rank`` below —
    pre-filter each stratum by a hash-prefix range that over-samples
    ~2x, rank only the survivors, audit-and-widen on undershoot."""
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("strat-"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        d.select("doc_id", "lang", F.row_number().over(w).cast("bigint").alias("rk"))
        .filter(F.col("rk") <= STRATA_N)
    )


SOURCE_CAP = 15  # max documents kept per source (sf0.01 has 25/source)


@query(
    "x_source_cap",
    oracle=f"""
    SELECT doc_id, source, rk,
           rk <= {SOURCE_CAP} AS kept
    FROM (
      SELECT doc_id, source,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5('cap-' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS BIGINT) AS rk
      FROM documents
    )
    """,
)
def x_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (the Gopher/RefinedWeb "max N pages per
    domain" rule): within each source, rank documents by a
    content-addressed hash and keep at most {SOURCE_CAP}. Emits the full
    audit frame (every doc with its in-source rank and kept flag) so the
    downstream filter AND the drop report come from one pass.

    Hash-rank, not rand() or crawl order: the cap is reproducible across
    engines/runs, and a re-crawl that appends pages displaces at most the
    marginal ranks of its own domain instead of resampling everything.

    Scale shape: one shuffle on source + per-partition sort — identical to
    w_topk_group. At 100 TB the hazard is domain skew (one domain with
    10^8 pages); the mitigation is implemented and equivalence-tested as
    ``capped_hash_rank`` below: a hash-prefix pre-filter caps the
    per-group sort input at ~2x the cap before ranking."""
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("cap-"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return d.select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("bigint").alias("rk"),
        (F.row_number().over(w) <= SOURCE_CAP).alias("kept"),
    )


def capped_hash_rank(
    df: DataFrame,
    group_col: str,
    hash_col: Column,
    cap: int,
    oversample: float = 2.0,
    max_widen: int = 4,
    tiebreak: str | None = None,
) -> DataFrame:
    """Skew-safe per-group top-``cap`` by hash order — the executable form
    of the "two-level pre-filter" mitigation x_stratified/x_source_cap
    document. Exact same result as
    ``row_number() OVER (PARTITION BY group ORDER BY hash) <= cap``,
    but the per-group SORT never sees more than ~oversample*cap rows:

      1. one map-side-combined groupBy counts each group;
      2. groups small enough (n <= oversample*cap) skip the filter;
         big groups keep only rows whose hash falls under a prefix
         threshold sized to admit ~oversample*cap of n uniform hashes;
      3. the survivors get the window rank (their sort is bounded);
      4. a survivor-count audit per big group verifies >= cap rows made
         the cut; undershoot (possible but exponentially unlikely at
         2x oversample) widens the threshold and retries — correctness
         never depends on the uniformity assumption, only speed does.

    The group-size/threshold table is group-cardinality-sized and
    broadcast; the audit collect is likewise bounded by the number of
    BIG groups, never rows. At 100 TB with a 10^8-page domain and
    cap=15 this turns a 10^8-row per-partition sort into ~30 rows.

    Determinism: equal hashes survive or fail the prefix filter TOGETHER
    (the filter reads only the hash), so the prefilter is tie-safe; only
    the final rank among equal hashes is order-dependent. Pass
    ``tiebreak`` (a unique column, e.g. doc_id) to pin it — same pattern
    as x_source_cap/x_stratified — or guarantee ``hash_col`` is
    injective over the input (ADVICE r3 #2).

    Caching: the hashed input is persisted for the lifetime of the
    returned (lazy) plan because audit attempts and the final rank all
    reuse it; the repo-wide convention is that multi-query drivers call
    ``spark.catalog.clearCache()`` between queries (bench.py and
    tools/selfcheck.py do) rather than each operator guessing when its
    consumer has materialized — same contract as lm.doc_term_counts and
    dedup.shingled_docs (ADVICE r3 #3)."""
    # consumed once per audit attempt plus the final ranking — persist so
    # the input lineage is computed exactly once, which is the point of a
    # utility whose target is 10^8-row skewed inputs
    hashed = df.withColumn("__h", hash_col).persist()
    sizes = hashed.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    target = int(cap * oversample)
    for attempt in range(max_widen + 1):
        widen = 2**attempt
        # fraction of the uniform hex space to admit: ~target*widen of n;
        # frac >= 1 admits the whole group (thr 'ffff' — md5 is lowercase,
        # so the threshold must be lowercased too: conv() emits uppercase,
        # and 'A' < 'a' would silently shrink the admitted range)
        frac = F.lit(float(target * widen)) / F.col("__n")
        thr_int = F.least(F.lit(65535), F.ceil(frac * 65536)).cast("int")
        thr = F.lower(
            F.lpad(F.conv(thr_int.cast("string"), 10, 16), 4, "0")
        )
        bounds = sizes.select(group_col, F.col("__n"), thr.alias("__thr"))
        survivors = hashed.join(F.broadcast(bounds), group_col).filter(
            (F.col("__n") <= target * widen)
            | (F.substring("__h", 1, 4) <= F.col("__thr"))
        )
        # audit against ALL groups (sizes), not the surviving ones — a
        # group that lost every row to the prefilter must still flag
        kept = survivors.groupBy(group_col).agg(
            F.count(F.lit(1)).alias("__kept")
        )
        audit = (
            sizes.join(kept, group_col, "left")
            .filter(
                (F.col("__n") > target * widen)
                & (
                    F.coalesce(F.col("__kept"), F.lit(0))
                    < F.least(F.lit(cap), F.col("__n"))
                )
            )
            .count()
        )
        if audit == 0:
            break
    else:  # exhausted widening without a clean audit: admit everything —
        # exactness beats speed; with uniform hashes this is unreachable
        survivors = hashed.join(
            F.broadcast(sizes.withColumn("__thr", F.lit("ffff"))), group_col
        )
    order = ["__h"] if tiebreak is None else ["__h", tiebreak]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        survivors.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= cap)
        .drop("__h", "__n", "__thr")
    )


BATCH_SIZE = 16  # docs per training micro-batch


@query(
    "x_length_batches",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                             t -> t <> '')) AS n_tokens,
             md5('batch-' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ), b AS (
      SELECT doc_id, n_tokens,
             CAST(floor(log2(n_tokens)) AS INT) AS bucket,
             CAST(row_number() OVER (PARTITION BY floor(log2(n_tokens))
                                     ORDER BY h, doc_id) - 1 AS BIGINT) AS rn
      FROM t WHERE n_tokens > 0
    )
    SELECT doc_id, n_tokens, bucket,
           CAST(rn // {BATCH_SIZE} AS BIGINT) AS batch_idx,
           CAST(rn % {BATCH_SIZE} AS BIGINT) AS pos_in_batch
    FROM b
    """,
)
def x_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assignment (dynamic-batching prep): docs
    group into power-of-two length buckets so each training micro-batch
    pads to at most 2× its shortest member; within a bucket, batch
    membership and order are content-addressed (md5 of doc_id) — the
    same reshuffle-free determinism as x_shard_shuffle, so batch
    composition is reproducible and independent of partitioning.

    Scale shape: one projection + one window PARTITIONED by bucket
    (≈log2(max_len) partitions — a few dozen; per-bucket volume is
    corpus-sized/buckets, and a pathologically hot bucket takes the
    capped_hash_rank two-level prefilter, sampling.py:401). No global
    sort; the hash order makes rank assignment independent of input
    order."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    from imagingdb_spark.operators.text import tokens_col

    t = d.select(
        "doc_id",
        F.size(tokens_col(F.col("text"))).alias("n_tokens"),
        F.md5(F.concat(F.lit("batch-"), F.col("doc_id").cast("string"))).alias(
            "h"
        ),
    ).filter(F.col("n_tokens") > 0)
    bucket = F.floor(F.log2("n_tokens")).cast("int")
    w = Window.partitionBy(bucket).orderBy("h", "doc_id")
    rn = F.row_number().over(w) - 1
    return t.select(
        "doc_id",
        "n_tokens",
        bucket.alias("bucket"),
        (rn / BATCH_SIZE).cast("bigint").alias("batch_idx"),
        (rn % BATCH_SIZE).cast("bigint").alias("pos_in_batch"),
    )


@query(
    "x_rebalance",
    oracle="""
    WITH cnt AS (
      SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
    ), mx AS (
      SELECT max(n) AS m FROM cnt
    ), spec AS (
      SELECT label,
             CAST((SELECT m FROM mx) // n AS BIGINT) AS base,
             CAST((SELECT m FROM mx) % n AS BIGINT) AS rem
      FROM cnt
    ), ranked AS (
      SELECT e.vec_id, e.label, s.base, s.rem,
             row_number() OVER (
               PARTITION BY e.label
               ORDER BY md5('bal-' || CAST(e.vec_id AS VARCHAR)), e.vec_id
             ) AS rk
      FROM embeddings e JOIN spec s USING (label)
    )
    SELECT vec_id, label,
           CAST(unnest(generate_series(
             1, base + CASE WHEN rk <= rem THEN 1 ELSE 0 END)) AS INT)
             AS copy_idx
    FROM ranked
    """,
)
def x_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8e: CLASS REBALANCING by deterministic oversampling — replicate
    every class's rows to exactly the majority class's count (the
    oversampling half of imbalanced-training prep; the undersampling half
    is x_source_cap). Each row of class c gets floor(m/n_c) copies, and
    the hash-ranked first (m mod n_c) rows one extra — so every class
    lands on EXACTLY m rows, and which rows carry the extra copy is a
    pure function of vec_id (stable under re-runs and appends, same
    rationale as split_col; never rand()).

    Scale shape: the class-count table is group-cardinality-sized and
    broadcast both ways (counts join, scalar max); replication itself is
    map-side explode(sequence(1, copies)) — output-proportional, no
    shuffle. The only row-proportional shuffle is the per-class
    row_number window that picks remainder rows; it keys on (label), the
    classic skew shape when one class dominates — at 100 TB swap the
    rank for capped_hash_rank (sampling.py:401), the skew-safe capped
    per-group top-k, with cap = rem (rem < m/1 is bounded by the class
    size); here the exact window keeps the oracle twin byte-exact.

    Output (vec_id, label, copy_idx): downstream joins back to the
    feature columns by vec_id, so the wide embedding arrays never ride
    through the window or the explode."""
    e = table(spark, sf_dir, "embeddings")
    cnt = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    mx = cnt.agg(F.max("n").alias("m"))
    spec = cnt.crossJoin(F.broadcast(mx)).select(
        "label",
        F.floor(F.col("m") / F.col("n")).alias("base"),
        (F.col("m") % F.col("n")).alias("rem"),
    )
    rk = F.row_number().over(
        Window.partitionBy("label").orderBy(
            F.md5(F.concat(F.lit("bal-"), F.col("vec_id").cast("string"))),
            "vec_id",
        )
    )
    ranked = (
        e.select("vec_id", "label")
        .join(F.broadcast(spec), "label")
        .withColumn("rk", rk)
    )
    copies = F.col("base") + F.when(F.col("rk") <= F.col("rem"), 1).otherwise(0)
    return ranked.select(
        "vec_id",
        "label",
        F.explode(F.sequence(F.lit(1), copies.cast("int"))).alias("copy_idx"),
    )


DSIR_BUCKETS = 256      # 2 md5 hex chars of feature-hash resolution
DSIR_TARGET_LANG = "en" # the "small clean corpus" analog in the testdata
DSIR_TOP_K = 100


# shared weight CTE: both DSIR oracles (top-k select, Gumbel resample)
# compute the identical per-doc importance weight
_DSIR_WT_SQL = f"""
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, lang,
             unnest(list_concat(
               toks,
               list_transform(range(len(toks) - 1),
                              i -> toks[i+1] || ' ' || toks[i+2]))) AS gm
      FROM t
    ), b AS (
      SELECT doc_id, lang, substr(md5(gm), 1, 2) AS bucket FROM g
    ), tb AS (
      SELECT bucket, COUNT(*) AS tc FROM b
      WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY bucket
    ), pb AS (
      SELECT doc_id, bucket, COUNT(*) AS c FROM b
      WHERE lang <> '{DSIR_TARGET_LANG}' GROUP BY doc_id, bucket
    ), rb AS (
      SELECT bucket, CAST(SUM(c) AS BIGINT) AS rc FROM pb GROUP BY bucket
    ), tt AS (
      SELECT CAST(SUM(tc) AS DOUBLE) AS total_t FROM tb
    ), rt AS (
      SELECT CAST(SUM(rc) AS DOUBLE) AS total_r FROM rb
    ), lr AS (
      SELECT rb.bucket,
             ln((COALESCE(tb.tc, 0) + 1) / (tt.total_t + {DSIR_BUCKETS}))
               - ln((rb.rc + 1) / (rt.total_r + {DSIR_BUCKETS})) AS lr
      FROM rb LEFT JOIN tb USING (bucket), tt, rt
    ), w AS (
      -- ordered aggregate: fold ascending by bucket so the float sum
      -- order is IDENTICAL to the Spark side's array_sort + left-fold
      SELECT pb.doc_id, SUM(pb.c * lr.lr ORDER BY pb.bucket) AS wt
      FROM pb JOIN lr USING (bucket)
      GROUP BY pb.doc_id
    )
"""


@query(
    "x_dsir_select",
    oracle=_DSIR_WT_SQL
    + f"""
    SELECT doc_id, round(wt, 4) + 0.0 AS dsir_weight
    FROM w
    ORDER BY wt DESC, doc_id ASC
    LIMIT {DSIR_TOP_K}
    """,
)
def x_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al., "Data Selection for Language
    Models via Importance Resampling", NeurIPS 2023 — public): pick from
    the raw pool (lang <> 'en') the documents whose hashed-n-gram
    distribution looks most like the target corpus (lang = 'en'). Features
    are unigrams + word bigrams hashed into DSIR_BUCKETS buckets (2 md5
    hex chars — the same engine-portable content-addressed hash every
    split/sample op here uses); each bucket gets an add-one-smoothed
    log-likelihood ratio ln(p_target/p_raw), and a document's importance
    weight is the sum of its gram-count-weighted bucket ratios. Top
    DSIR_TOP_K by weight (doc_id tiebreak) is the selected batch. (The
    paper resamples with Gumbel noise; the deterministic top-k variant
    keeps the oracle twin exact — plug split_col-style hashed noise in
    for sampled selection.)

    Determinism discipline: the per-doc weight folds its bucket
    contributions in ASCENDING BUCKET ORDER on both engines (Spark:
    array_sort(collect_list(struct(bucket, contrib))) + left-fold;
    oracle: SUM(... ORDER BY bucket)) — the x_embed_quantize lesson that
    unordered float sums differ by an ulp on some corpus eventually. The
    ranking uses the RAW double (bit-identical by construction); rounding
    to 4 is display-only.

    Scale shape: ONE corpus pass explodes grams map-side; everything
    after is bucket-keyed — the target/raw bucket tables are
    DSIR_BUCKETS-sized aggregates (map-side partial, shuffle rows =
    buckets x partitions), the log-ratio table is 256 rows and
    BROADCAST into the per-doc join, and the per-doc fold is bounded at
    DSIR_BUCKETS elements per group. The only corpus-proportional
    shuffle is the (doc_id, bucket) count, capped at 256 rows per
    document. Top-k compiles to TakeOrderedAndProject — no global sort.
    At 100 TB: identical shapes; raise DSIR_BUCKETS (the paper uses
    10k-1M) and the ratio table stays a broadcast dim."""
    w = dsir_weights(spark, sf_dir)
    return (
        w.orderBy(F.col("wt").desc(), F.col("doc_id").asc())
        .limit(DSIR_TOP_K)
        .select("doc_id", (F.round("wt", 4) + 0.0).alias("dsir_weight"))
    )


def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, wt): the shared DSIR importance-weight pipeline — see
    x_dsir_select for the full rationale; x_dsir_resample adds hashed
    Gumbel noise on top of the same weights."""
    from imagingdb_spark.operators.lm import attach_scalar

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", tokens_col(F.col("text")).alias("toks"))
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 2),
        lambda i: F.concat(
            F.element_at("toks", i + 1), F.lit(" "), F.element_at("toks", i + 2)
        ),
    )
    grams = toks.filter(F.size("toks") >= 1).select(
        "doc_id",
        "lang",
        F.explode(
            F.concat(
                F.col("toks"),
                F.when(F.size("toks") >= 2, bigrams).otherwise(F.array()),
            )
        ).alias("gm"),
    )
    # ONE corpus pass: the per-(doc, bucket) count table feeds the target
    # histogram, the raw histogram AND the scoring join, so persist it
    # (lm.doc_term_counts rationale — no automatic subplan sharing; the
    # bench/selfcheck harnesses clearCache() between queries). Bounded at
    # DSIR_BUCKETS rows per document.
    db = (
        grams.select(
            "doc_id", "lang", F.substring(F.md5("gm"), 1, 2).alias("bucket")
        )
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    tb = (
        db.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("bucket")
        .agg(F.sum("c").alias("tc"))
    )
    pb = db.filter(F.col("lang") != DSIR_TARGET_LANG).select(
        "doc_id", "bucket", "c"
    )
    rb = pb.groupBy("bucket").agg(F.sum("c").alias("rc"))
    tt = tb.agg(F.sum("tc").cast("double").alias("total_t"))
    rt = rb.agg(F.sum("rc").cast("double").alias("total_r"))
    lr = attach_scalar(
        attach_scalar(rb.join(tb, "bucket", "left").fillna(0, ["tc"]), tt), rt
    ).select(
        "bucket",
        (
            F.log((F.col("tc") + 1) / (F.col("total_t") + DSIR_BUCKETS))
            - F.log((F.col("rc") + 1) / (F.col("total_r") + DSIR_BUCKETS))
        ).alias("lr"),
    )
    w = (
        pb.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("bucket"), (F.col("c") * F.col("lr")).alias("v")
                        )
                    )
                ),
                F.lit(0.0),
                lambda acc, s: acc + s["v"],
            ).alias("wt")
        )
    )
    return w


@query(
    "x_dsir_resample",
    oracle=_DSIR_WT_SQL
    + f"""
    SELECT doc_id,
           round(wt, 4) + 0.0 AS dsir_weight,
           round(wt - ln(-ln(
             (CAST('0x' || substr(md5('gum-' || CAST(doc_id AS VARCHAR)), 1, 4)
                   AS INTEGER) + 0.5) / 65536.0)), 4) + 0.0 AS gumbel_key
    FROM w
    ORDER BY wt - ln(-ln(
      (CAST('0x' || substr(md5('gum-' || CAST(doc_id AS VARCHAR)), 1, 4)
            AS INTEGER) + 0.5) / 65536.0)) DESC, doc_id ASC
    LIMIT {DSIR_TOP_K}
    """,
)
def x_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR's actual selection rule — IMPORTANCE RESAMPLING, not top-k:
    the paper samples documents without replacement with probability
    proportional to exp(weight), which the Gumbel top-k trick turns into
    an ordinary top-k over (weight + Gumbel noise). The noise is
    CONTENT-ADDRESSED like every sampling op here: u = (md5-bucket of
    'gum-'||doc_id + 0.5) / 65536 (the +0.5 keeps u strictly inside
    (0, 1) so -ln(-ln u) is finite), g = -ln(-ln u) — no RNG, no seed
    state, reproducible across engines/runs/cluster sizes, and appending
    new documents never changes existing docs' noise. Ranking uses the
    raw double key (weights and noise are bit-identical on both engines
    by the same discipline as x_dsir_select); rounding is display-only.

    Scale shape: x_dsir_select's shapes plus one map-side expression for
    the noise — the hex-to-int, ln and subtraction never touch a
    shuffle. Top-k is TakeOrderedAndProject."""
    w = dsir_weights(spark, sf_dir)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("gum-"), F.col("doc_id").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / 65536.0
    key = F.col("wt") - F.log(-F.log(u))
    return (
        w.withColumn("key", key)
        .orderBy(F.col("key").desc(), F.col("doc_id").asc())
        .limit(DSIR_TOP_K)
        .select(
            "doc_id",
            (F.round("wt", 4) + 0.0).alias("dsir_weight"),
            (F.round("key", 4) + 0.0).alias("gumbel_key"),
        )
    )
