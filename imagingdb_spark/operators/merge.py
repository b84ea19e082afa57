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


def merge_scd2(
    history: DataFrame,
    changes: DataFrame,
    key: str,
    change_ts: str = "change_ts",
) -> DataFrame:
    """Generic SCD-2 merge (Kimball slowly-changing-dimension type 2,
    public): ``history`` rows carry validity intervals (``valid_from``,
    ``valid_to`` NULL = current); a change row CLOSES the key's current
    interval at its timestamp and OPENS a new one — but ONLY when some
    tracked attribute actually changed (a change row identical to the
    current attributes is a no-op, so re-deliveries don't fragment
    history). Unknown keys open their first interval. Closed history is
    immutable and passes through untouched.

    Scale shape: one full-outer join of the CURRENT slice against the
    change batch on the key (the same exchange profile as merge_upsert —
    at 100 TB bucket the history by key and only the batch shuffles);
    closed rows ride a union, no shuffle. The attribute comparison is a
    null-safe conjunction evaluated inside the join project — no second
    pass."""
    attrs = [
        c for c in history.columns if c not in (key, "valid_from", "valid_to")
    ]
    if set(changes.columns) != {key, change_ts, *attrs}:
        raise ValueError("merge_scd2: changes must carry key + ts + attrs")
    closed = history.filter(F.col("valid_to").isNotNull())
    t = history.filter(F.col("valid_to").isNull()).alias("t")
    c = changes.alias("c")
    j = t.join(c, F.col(f"t.{key}") == F.col(f"c.{key}"), "full_outer")
    same = F.lit(True)
    for a in attrs:
        same = same & F.col(f"t.{a}").eqNullSafe(F.col(f"c.{a}"))
    matched = F.col(f"t.{key}").isNotNull() & F.col(f"c.{key}").isNotNull()
    closes = matched & ~same
    old_rows = j.filter(F.col(f"t.{key}").isNotNull()).select(
        F.col(f"t.{key}").alias(key),
        *[F.col(f"t.{a}").alias(a) for a in attrs],
        F.col("t.valid_from").alias("valid_from"),
        F.when(closes, F.col(f"c.{change_ts}")).alias("valid_to"),
    )
    new_rows = j.filter(closes | (matched == F.lit(False)) & F.col(f"c.{key}").isNotNull()).select(
        F.col(f"c.{key}").alias(key),
        *[F.col(f"c.{a}").alias(a) for a in attrs],
        F.col(f"c.{change_ts}").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    return closed.unionByName(old_rows).unionByName(new_rows)


SCD2_T0 = "2024-01-01 00:00:00"
SCD2_T1 = "2024-02-01 00:00:00"


@query(
    "x_scd2_history",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang,
             substr(md5('scd-' || CAST(doc_id AS VARCHAR)), 1, 1) AS h
      FROM documents
    ), chg AS (
      SELECT doc_id,
             CASE WHEN h IN ('0','1','2','3') THEN lang || '-2'
                  ELSE lang END AS new_lang
      FROM keyed WHERE h IN ('0','1','2','3','4','5')
    ), diff AS (
      SELECT c.doc_id, c.new_lang
      FROM chg c JOIN documents d USING (doc_id)
      WHERE c.new_lang <> d.lang
    )
    SELECT d.doc_id, d.lang,
           TIMESTAMP '{SCD2_T0}' AS valid_from,
           CASE WHEN f.doc_id IS NOT NULL
                THEN TIMESTAMP '{SCD2_T1}' END AS valid_to,
           f.doc_id IS NULL AS is_current
    FROM documents d LEFT JOIN diff f USING (doc_id)
    UNION ALL
    SELECT doc_id, new_lang, TIMESTAMP '{SCD2_T1}', NULL, TRUE FROM diff
    """,
)
def x_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 dimension history over the documents corpus: a deterministic
    re-classification batch (md5-sliced — ~25% of docs get a new lang,
    another ~12% are re-delivered UNCHANGED to exercise the no-op path)
    closes the original validity interval at T1 and opens a new current
    row. Output: the full history with is_current, the lineage a training
    pipeline needs to answer "which lang did this doc have when snapshot
    X was cut?". The no-op slice must leave exactly one open row per key
    — interval fragmentation on re-delivery is THE classic SCD-2 bug."""
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    history = d.select(
        "doc_id",
        "lang",
        F.lit(SCD2_T0).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    h = F.substring(
        F.md5(F.concat(F.lit("scd-"), F.col("doc_id").cast("string"))), 1, 1
    )
    changes = (
        d.withColumn("h", h)
        .filter(F.col("h").isin(*"012345"))
        .select(
            "doc_id",
            F.when(
                F.col("h").isin(*"0123"), F.concat("lang", F.lit("-2"))
            )
            .otherwise(F.col("lang"))
            .alias("lang"),
            F.lit(SCD2_T1).cast("timestamp").alias("change_ts"),
        )
    )
    out = merge_scd2(history, changes, key="doc_id")
    return out.select(
        "doc_id",
        "lang",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


def table_diff(a: DataFrame, b: DataFrame, key: str, cmp: str) -> DataFrame:
    """Snapshot reconciliation: full-outer join two keyed snapshots and
    classify every key as added / removed / changed / unchanged by
    comparing the ``cmp`` column (pass a content hash for wide rows).
    The anti-entropy primitive behind replica repair, backup verification,
    and "what did yesterday's pipeline run actually change" audits."""
    ta = a.alias("a")
    tb = b.alias("b")
    joined = ta.join(tb, F.col(f"a.{key}") == F.col(f"b.{key}"), "full_outer")
    status = (
        F.when(F.col(f"a.{key}").isNull(), F.lit("added"))
        .when(F.col(f"b.{key}").isNull(), F.lit("removed"))
        # null-safe: NULL content on both sides is unchanged, not changed
        .when(F.col(f"a.{cmp}").eqNullSafe(F.col(f"b.{cmp}")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.coalesce(F.col(f"b.{key}"), F.col(f"a.{key}")).alias(key),
        status.alias("status"),
    )


@query(
    "x_table_diff",
    oracle=f"""
    WITH b AS (
      SELECT doc_id + {INSERT_ID_OFFSET} AS doc_id,
             'new page ' || CAST(doc_id AS VARCHAR) AS text
      FROM documents
      WHERE substr(md5('add-' || CAST(doc_id AS VARCHAR)), 1, 1) = '0'
      UNION ALL
      SELECT doc_id,
             CASE WHEN substr(md5('chg-' || CAST(doc_id AS VARCHAR)), 1, 1)
                         IN ('0', '1')
                  THEN text || ' [edit]' ELSE text END AS text
      FROM documents
      WHERE substr(md5('del-' || CAST(doc_id AS VARCHAR)), 1, 1) <> '0'
    )
    SELECT COALESCE(b.doc_id, a.doc_id) AS doc_id,
           CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b.doc_id IS NULL THEN 'removed'
                WHEN a.text IS NOT DISTINCT FROM b.text THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    """,
)
def x_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two corpus snapshots: snapshot B is documents after a
    content-addressed synthetic day of churn (~6% deleted, ~12% edited,
    ~6% new pages in a disjoint key range — identical batch on both
    engines by construction). Output: every key with its
    added/removed/changed/unchanged status.

    Scale shape: same as MERGE — one shuffle per side on the key, compare
    on a content column (at 100 TB you diff sha256(text) columns so the
    shuffle carries 32 bytes per row, never page bodies; the classify is
    a pure projection after the join). Bucketed snapshots make it
    shuffle-free."""
    a = table(spark, sf_dir, "documents").select("doc_id", "text")
    h = lambda prefix: F.substring(  # noqa: E731
        F.md5(F.concat(F.lit(prefix), F.col("doc_id").cast("string"))), 1, 1
    )
    added = a.filter(h("add-") == "0").select(
        (F.col("doc_id") + INSERT_ID_OFFSET).alias("doc_id"),
        F.concat(F.lit("new page "), F.col("doc_id").cast("string")).alias("text"),
    )
    survived = a.filter(h("del-") != "0").select(
        "doc_id",
        F.when(
            h("chg-").isin("0", "1"), F.concat("text", F.lit(" [edit]"))
        ).otherwise(F.col("text")).alias("text"),
    )
    b = added.unionByName(survived)
    return table_diff(a, b, key="doc_id", cmp="text")


def cdc_apply(base: DataFrame, log: DataFrame, key: str) -> DataFrame:
    """Apply an ordered change-data-capture log to a keyed snapshot:
    ``log`` rows are (key, seq, op in {'U','D'}, attrs); per key the
    HIGHEST seq wins (last-write-wins), a winning 'D' removes the key,
    and keys absent from the log pass through. Unlike merge_upsert
    (unordered batch, one change per key) this is the replication-stream
    shape: several competing changes per key, ordered by the log
    sequence, with deletes.

    Scale shape: one shuffle of the log on (key) for the per-key
    max-seq reduction (log-sized, not corpus-sized), then one key-keyed
    outer join against the base — the same exchange profile as MERGE.
    The reduction is an aggregate (struct max), not a window: no per-key
    sort, map-side partial applies. The struct max resolves the winning
    log ROW atomically — per-column max_by calls would mix columns from
    different rows on a seq tie — and deterministically: ties on seq
    break by (op, attrs) tuple order, and a NULL attribute on the winning
    row is KEPT (max_by/arg_max variants silently skip NULL values,
    resurrecting older content)."""
    attrs = [c for c in base.columns if c != key]
    latest = (
        log.groupBy(key)
        .agg(F.max(F.struct("seq", "op", *attrs)).alias("__m"))
        .select(
            key,
            F.col("__m.seq").alias("last_seq"),
            F.col("__m.op").alias("op"),
            *[F.col(f"__m.{a}").alias(a) for a in attrs],
        )
    )
    b = base.alias("b")
    l = latest.alias("l")  # noqa: E741
    j = b.join(l, F.col(f"b.{key}") == F.col(f"l.{key}"), "full_outer")
    keep = F.col(f"l.{key}").isNull() | (F.col("l.op") != "D")
    return j.filter(keep).select(
        F.coalesce(F.col(f"l.{key}"), F.col(f"b.{key}")).alias(key),
        *[
            F.when(F.col(f"l.{key}").isNotNull(), F.col(f"l.{a}"))
            .otherwise(F.col(f"b.{a}"))
            .alias(a)
            for a in attrs
        ],
        F.coalesce(F.col("l.last_seq"), F.lit(0)).cast("bigint").alias("last_seq"),
    )


@query(
    "x_cdc_apply",
    oracle="""
    WITH log AS (
      SELECT doc_id, 1 AS seq, 'U' AS op, text || ' v2' AS text
      FROM documents
      WHERE substr(md5('cdc1-' || CAST(doc_id AS VARCHAR)), 1, 1)
              IN ('0','1','2','3')
      UNION ALL
      SELECT doc_id, 2, 'D', NULL
      FROM documents
      WHERE substr(md5('cdc2-' || CAST(doc_id AS VARCHAR)), 1, 1)
              IN ('0','1')
      UNION ALL
      SELECT doc_id, 3, 'U', text || ' v3'
      FROM documents
      WHERE substr(md5('cdc3-' || CAST(doc_id AS VARCHAR)), 1, 1) = '0'
    ), latest AS (
      -- whole-row resolution via max-seq join, NOT arg_max(col, seq):
      -- arg_max skips NULL values, which would resurrect older content
      -- when the winning row legitimately sets a column to NULL
      SELECT l.doc_id, CAST(l.seq AS BIGINT) AS last_seq, l.op, l.text
      FROM log l
      JOIN (SELECT doc_id, max(seq) AS ms FROM log GROUP BY doc_id) m
        ON l.doc_id = m.doc_id AND l.seq = m.ms
    )
    SELECT COALESCE(l.doc_id, b.doc_id) AS doc_id,
           CAST(length(CASE WHEN l.doc_id IS NOT NULL THEN l.text
                            ELSE b.text END) AS BIGINT) AS n_chars,
           COALESCE(l.last_seq, 0) AS last_seq
    FROM documents b FULL OUTER JOIN latest l ON b.doc_id = l.doc_id
    WHERE l.doc_id IS NULL OR l.op <> 'D'
    """,
)
def x_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay a CDC log onto the documents corpus: a content-addressed
    synthetic log with three epochs (~25% updated at seq 1, ~12% deleted
    at seq 2, ~6% re-updated at seq 3) — so some keys carry COMPETING
    changes and the outcome depends on log order, which is the property
    that separates CDC apply from plain MERGE. Projected to
    (doc_id, n_chars, last_seq) for an order-free oracle hash. Note
    seq-3 updates can resurrect-with-content keys deleted at seq 2 only
    if the same key is in both slices — last-write-wins decides, on both
    engines, by max seq."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    h = lambda p: F.substring(  # noqa: E731
        F.md5(F.concat(F.lit(p), F.col("doc_id").cast("string"))), 1, 1
    )
    # all three log epochs in ONE scan (r11, guide §2.4: the old
    # three-filter union scanned the corpus three times): each doc emits
    # the 0–3 log rows its content hashes select, via a map-side
    # array-of-candidates explode. Row set identical by construction.
    mk = lambda seq, op, txt: F.struct(  # noqa: E731
        F.lit(seq).alias("seq"), F.lit(op).alias("op"), txt.alias("text")
    )
    cands = F.array(
        F.when(h("cdc1-").isin(*"0123"), mk(1, "U", F.concat("text", F.lit(" v2")))),
        F.when(h("cdc2-").isin(*"01"), mk(2, "D", F.lit(None).cast("string"))),
        F.when(h("cdc3-") == "0", mk(3, "U", F.concat("text", F.lit(" v3")))),
    )
    log = (
        d.select(
            "doc_id",
            F.explode(F.filter(cands, lambda c: c.isNotNull())).alias("__c"),
        )
        .select("doc_id", "__c.seq", "__c.op", "__c.text")
    )
    out = cdc_apply(d, log, key="doc_id")
    return out.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        "last_seq",
    )
