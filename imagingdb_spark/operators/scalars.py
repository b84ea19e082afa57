"""Scalar-function operators (SURVEY.md §2.8, F1-F9).

Everything here is a built-in JVM expression (whole-stage codegen) — the
reference does all of this row-at-a-time in Python loops (filename parsers,
serial→datetime derivation, sha256 hashing); at 100 TB the difference
between a codegen'd `sha2` and a Python-loop hash is the whole job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imagingdb_spark.catalog import table
from imagingdb_spark.registry import query


@query(
    "f_string_parse",
    oracle="""
    SELECT c_name,
           CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT) AS parsed_id,
           split_part(c_name, '#', 1) AS name_prefix
    FROM customer
    """,
)
def f_string_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: split / regexp parsing — filename→indices via `re.findall('\\d+')`
    (filename_parsers.py:74-111) and serial→parts via split('-')
    (dataset.py:9-18)."""
    return table(spark, sf_dir, "customer").select(
        "c_name",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("bigint").alias("parsed_id"),
        F.split("c_name", "#").getItem(0).alias("name_prefix"),
    )


@query(
    "f_format",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           printf('im_c%03d_z%03d_t%03d_p%03d.png',
                  l_linenumber, CAST(l_suppkey % 100 AS INT),
                  0, CAST(l_partkey % 1000 AS INT)) AS file_name
    FROM lineitem
    """,
)
def f_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: zero-padded frame-name construction `im_c%03d_z%03d_t%03d_p%03d.png`
    (file_splitter.py:114-125) via format_string."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.format_string(
            "im_c%03d_z%03d_t%03d_p%03d.png",
            F.col("l_linenumber"),
            (F.col("l_suppkey") % 100).cast("int"),
            F.lit(0),
            (F.col("l_partkey") % 1000).cast("int"),
        ).alias("file_name"),
    )


@query(
    "f_dates",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           date_trunc('month', o_orderdate) AS month_start,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           CAST(o_orderdate >= TIMESTAMP '1997-06-01' AS BOOLEAN) AS is_recent
    FROM orders
    """,
)
def f_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: datetime construction/extraction/comparison — the serial→date_time
    derivation (dataset.py:9-18) and strptime validation (cli_utils.py:44-68)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        (F.col("o_orderdate") >= F.lit("1997-06-01").cast("timestamp")).alias("is_recent"),
    )


@query(
    "f_sha2",
    oracle="""
    SELECT doc_id, sha256(text) AS text_sha256
    FROM documents
    """,
)
def f_sha2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: integrity hashing — per-frame sha256 (meta_utils.py:72-102,
    file_splitter.py:82-93). Built-in sha2 runs JVM-side in the scan stage;
    the reference hashes per-frame in Python workers."""
    return table(spark, sf_dir, "documents").select(
        "doc_id", F.sha2(F.col("text"), 256).alias("text_sha256")
    )


@query(
    "f_validate_id",
    oracle="""
    SELECT serial,
           (len(string_split(serial, '-')) = 8
            AND regexp_matches(serial, '^[A-Z]+-\\d{4}-\\d{2}-\\d{2}-\\d{2}-\\d{2}-\\d{2}-\\d{4}$')
            AND TRY_CAST(string_split(serial, '-')[2] AS INT) BETWEEN 1995 AND 1998)
             AS is_valid
    FROM (
      SELECT printf('ORD-%s-%04d',
                    strftime(o_orderdate, '%Y-%m-%d-%H-%M-%S'),
                    CAST(o_orderkey % 10000 AS INT)) AS serial
      FROM orders
    )
    """,
)
def f_validate_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: dataset-serial validation (cli_utils.py:4-41: 8 dash-separated
    fields, per-field format + range checks) rewritten as a pure SQL
    predicate over a constructed serial. Ingest uses the same predicate as a
    CHECK-style constraint (see ingest.validate_serials)."""
    o = table(spark, sf_dir, "orders")
    serial = F.format_string(
        "ORD-%s-%04d",
        F.date_format("o_orderdate", "yyyy-MM-dd-HH-mm-ss"),
        (F.col("o_orderkey") % 10000).cast("int"),
    )
    df = o.select(serial.alias("serial"))
    parts = F.split("serial", "-")
    is_valid = (
        (F.size(parts) == 8)
        & F.col("serial").rlike(r"^[A-Z]+-\d{4}-\d{2}-\d{2}-\d{2}-\d{2}-\d{2}-\d{4}$")
        & parts.getItem(1).try_cast("int").between(1995, 1998)
    )
    return df.select("serial", is_valid.alias("is_valid"))


@query(
    "f_cast_coerce",
    oracle="""
    SELECT c_custkey,
           TRY_CAST(split_part(c_name, '#', 2) AS BIGINT) AS coerced_id,
           TRY_CAST(c_mktsegment AS BIGINT) AS not_a_number,
           CAST(round(c_acctbal) AS BIGINT) AS acctbal_int
    FROM customer
    """,
)
def f_cast_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: type coercion — str→int channel attempt (data_downloader.py:
    182-190: try int(c), fall back to string) as try_cast (null on failure,
    no task error), float→int narrowing."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.split("c_name", "#").getItem(1).try_cast("bigint").alias("coerced_id"),
        F.col("c_mktsegment").try_cast("bigint").alias("not_a_number"),
        F.round("c_acctbal").try_cast("bigint").alias("acctbal_int"),
    )


@query(
    "f_json_multi",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_raw,
           CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_num,
           json_extract_string(props, '$.absent') AS absent_field
    FROM events
    """,
)
def f_json_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: JSON field extraction with typed casts + missing-key null
    (json_operations.py:133-189 surface)."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_raw"),
        F.get_json_object("props", "$.k").cast("double").alias("k_num"),
        F.get_json_object("props", "$.absent").alias("absent_field"),
    )


@query(
    "f_from_json",
    oracle="""
    WITH built AS (
      SELECT doc_id,
             printf('{"lang": "%s", "weight": %d, "src": "%s"}',
                    lang, CAST(doc_id % 100 AS INT), source) AS raw
      FROM documents
    ), j AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN substr(raw, 1, len(raw) - 1)
                  ELSE raw END AS js
      FROM built
    )
    SELECT doc_id,
           json_valid(js) AS is_valid,
           CASE WHEN json_valid(js) THEN json_extract_string(js, '$.lang') END
             AS parsed_lang,
           CASE WHEN json_valid(js) THEN CAST(json_extract(js, '$.weight') AS INT) END
             AS parsed_weight,
           CASE WHEN json_valid(js) THEN json_extract_string(js, '$.src') END
             AS parsed_src
    FROM j
    """,
)
def f_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/F5: schema-validated JSON parsing — from_json with an explicit
    compiled schema + required-key validity, the Spark-native form of
    validate_schema (json_operations.py:70-98) / per-frame schema-driven
    extraction (:162-189). Every 7th document's JSON is deterministically
    truncated so the reject path is exercised: invalid rows parse to null
    fields and is_valid=false (batch-wise rejection instead of the
    reference's per-doc ValidationError)."""
    from imagingdb_spark.jsonio import compile_schema, validity_col

    schema = {
        "type": "object",
        "properties": {
            "lang": {"type": "string"},
            "weight": {"type": "integer"},
            "src": {"type": "string"},
        },
        "required": ["lang", "weight", "src"],
    }
    d = table(spark, sf_dir, "documents")
    raw = F.format_string(
        '{"lang": "%s", "weight": %d, "src": "%s"}',
        F.col("lang"),
        (F.col("doc_id") % 100).cast("int"),
        F.col("source"),
    )
    built = d.select("doc_id", raw.alias("raw")).withColumn(
        "js",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.expr("substring(raw, 1, length(raw) - 1)"),
        ).otherwise(F.col("raw")),
    )
    parsed = F.from_json("js", compile_schema(schema))
    tagged = built.select("doc_id", parsed.alias("parsed")).withColumn(
        "is_valid", validity_col(F.col("parsed"), schema)
    )
    # oracle emits INT32 weight (CAST ... AS INT); parsed.weight is LongType
    return tagged.select(
        "doc_id",
        "is_valid",
        F.when(F.col("is_valid"), F.col("parsed.lang")).alias("parsed_lang"),
        F.when(F.col("is_valid"), F.col("parsed.weight").cast("int")).alias(
            "parsed_weight"
        ),
        F.when(F.col("is_valid"), F.col("parsed.src")).alias("parsed_src"),
    )


@query(
    "f_path_ops",
    oracle="""
    SELECT doc_id,
           concat('raw_files/', source, '/', 'doc_', CAST(doc_id AS VARCHAR), '.txt')
             AS storage_key,
           regexp_extract(concat('raw_files/', source, '/doc_', CAST(doc_id AS VARCHAR), '.txt'),
                          '([^/]+)$', 1) AS base_name
    FROM documents
    """,
)
def f_path_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: storage-key construction + basename extraction (s3_storage.py:
    63-70, filename_parsers.py:20)."""
    d = table(spark, sf_dir, "documents")
    key = F.concat(
        F.lit("raw_files/"), F.col("source"), F.lit("/"),
        F.lit("doc_"), F.col("doc_id").cast("string"), F.lit(".txt"),
    )
    return d.select(
        "doc_id",
        key.alias("storage_key"),
        F.regexp_extract(key, r"([^/]+)$", 1).alias("base_name"),
    )


@query(
    "f_array_ops",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           round(list_aggregate(embedding[1:8]::DOUBLE[], 'sum'), 4) + 0.0 AS head_sum,
           round(list_aggregate(embedding::DOUBLE[], 'max'), 4) + 0.0 AS max_val,
           round(embedding[1], 4) + 0.0 AS first_val,
           CAST(list_position(embedding::DOUBLE[],
                              list_aggregate(embedding::DOUBLE[], 'max')) AS INT)
             AS argmax_pos
    FROM embeddings
    """,
)
def f_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: array/tensor ops at the metadata level (SURVEY §2.8 — the
    reference's stack/squeeze/atleast_3d numpy surface, data_storage.py:
    34-85, re-expressed as Spark array functions): size, slice + fold
    (aggregate), array_max, element_at, argmax via array_position. The
    array is cast ONCE in its own projection (higher-order lambdas are
    interpreted; re-casting per use would re-allocate per element-op).
    Left-fold summation order is identical in both engines, so the rounded
    values hash-match exactly. Every rounded float gets ``+ 0.0`` on BOTH
    sides: round() can yield -0.0 (a value in (-5e-5, 0)), the engines
    disagree on zero's sign, and IEEE ``-0.0 + 0.0 = +0.0`` canonicalizes
    it for free."""
    e = table(spark, sf_dir, "embeddings")
    emb = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    z = F.lit(0.0)
    return emb.select(
        "vec_id",
        F.size("v").alias("dim"),
        (F.round(
            F.aggregate(F.slice("v", 1, 8), F.lit(0.0), lambda a, x: a + x), 4
        ) + z).alias("head_sum"),
        (F.round(F.array_max("v"), 4) + z).alias("max_val"),
        (F.round(F.element_at("v", 1), 4) + z).alias("first_val"),
        F.array_position("v", F.array_max("v")).cast("int").alias("argmax_pos"),
    )
