"""JSON source + schema validation (SURVEY.md §2.1 S3, §1.3 schema-on-write).

Mirrors /root/reference/imaging_db/metadata/json_operations.py, Spark-first:

- ``validate_schema`` (json_operations.py:70-98): jsonschema validation of a
  single dict → here a JSON-Schema dict compiles ONCE (driver-side) to a
  Spark ``StructType`` + required-key list, and validation becomes JVM
  column expressions (``from_json`` + null checks) over whole columns —
  schema-on-read for millions of rows instead of a Python loop.
- ``read_json_file`` (json_operations.py:101-130): driver-side one-doc read
  → ``spark.read.json`` with the explicit compiled schema (never inference:
  an inference pass is a full extra scan at 100 TB) in PERMISSIVE mode with
  a ``_corrupt_record`` column.
- ``get_metadata_from_tags`` (json_operations.py:162-189): schema-driven
  extraction of required per-frame fields into typed columns.
- The reference's inline schemas (CREDENTIALS_SCHEMA json_operations.py:5-16,
  CONFIG_SCHEMA :18-28, MICROMETA_SCHEMA :30-67) are reproduced as data and
  compiled through the same path.

Validation semantics vs jsonschema: a row is valid iff the raw string parses
AND every ``required`` field (recursively) is non-null after typed parsing.
``from_json`` nulls a field on type mismatch, so wrong-typed required fields
are caught; a required key explicitly set to JSON ``null`` is treated as
missing (jsonschema would accept it — documented divergence, strictly
stricter).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Reference inline schemas (json_operations.py:5-67), verbatim as data.
CREDENTIALS_SCHEMA = {
    "type": "object",
    "properties": {
        "drivername": {"type": "string"},
        "username": {"type": "string"},
        "password": {"type": "string"},
        "host": {"type": "string"},
        "port": {"type": "integer"},
        "dbname": {"type": "string"},
    },
    "required": ["drivername", "username", "password", "host", "port", "dbname"],
}

CONFIG_SCHEMA = {
    "type": "object",
    "properties": {
        "upload_type": {"type": "string"},
        "frames_format": {"type": "string"},
        "meta_schema": {"type": "string"},
        "microscope": {"type": "string"},
        "filename_parser": {"type": "string"},
    },
    "required": ["upload_type", "microscope"],
}

MICROMETA_SCHEMA = {
    "type": "object",
    "properties": {
        "MicroManagerMetadata": {
            "type": "object",
            "properties": {
                "ChannelIndex": {"type": "integer"},
                "Slice": {"type": "integer"},
                "FrameIndex": {"type": "integer"},
                "PositionIndex": {"type": "integer"},
                "Channel": {"type": "string"},
                "Exposure-ms": {"type": "number"},
            },
            "required": [
                "ChannelIndex",
                "Slice",
                "FrameIndex",
                "PositionIndex",
                "Channel",
            ],
        }
    },
    "required": ["MicroManagerMetadata"],
}

_LEAF_TYPES = {
    "string": T.StringType(),
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "boolean": T.BooleanType(),
}


def compile_schema(schema: dict) -> T.StructType:
    """JSON Schema (the subset the reference uses: flat + one nested object
    level, leaf types string/integer/number/boolean, plus arrays of leaves)
    → Spark StructType. Compiled once driver-side; parsing then runs as a
    JVM expression."""
    if schema.get("type") != "object":
        raise ValueError(f"top-level schema must be an object, got {schema.get('type')}")
    fields = []
    for key, props in schema.get("properties", {}).items():
        t = props.get("type")
        if t == "object":
            fields.append(T.StructField(key, compile_schema(props), True))
        elif t == "array":
            item_t = props.get("items", {}).get("type", "string")
            fields.append(T.StructField(key, T.ArrayType(_LEAF_TYPES[item_t]), True))
        elif t in _LEAF_TYPES:
            fields.append(T.StructField(key, _LEAF_TYPES[t], True))
        else:
            raise ValueError(f"unsupported JSON-Schema type {t!r} for key {key!r}")
    return T.StructType(fields)


def _required_paths(schema: dict, prefix: str = "") -> list[str]:
    """Dotted paths of every (recursively) required field."""
    paths = []
    props = schema.get("properties", {})
    for key in schema.get("required", []):
        path = f"{prefix}{key}"
        sub = props.get(key, {})
        if sub.get("type") == "object":
            nested = _required_paths(sub, prefix=path + ".")
            # the object itself must be present even if it requires nothing
            paths.extend(nested or [path])
        else:
            paths.append(path)
    return paths


def validity_col(parsed: Column, schema: dict) -> Column:
    """Boolean validity of a from_json-parsed struct column under `schema`:
    struct non-null (raw string parsed) AND every required path non-null
    (present and type-conformant — from_json nulls mismatched types)."""
    cond = parsed.isNotNull()
    for path in _required_paths(schema):
        field = parsed
        for part in path.split("."):
            field = field[part]
        cond = cond & field.isNotNull()
    return cond


def parse_json_col(
    df: DataFrame, json_col: str, schema: dict,
    parsed_name: str = "parsed", valid_name: str = "is_valid",
) -> DataFrame:
    """validate_schema over a whole column: adds a typed `parsed` struct and
    an `is_valid` boolean. One projection, all JVM-side."""
    struct = compile_schema(schema)
    parsed = F.from_json(F.col(json_col), struct)
    return df.withColumn(parsed_name, parsed).withColumn(
        valid_name, validity_col(F.col(parsed_name), schema)
    )


def split_valid(
    df: DataFrame, json_col: str, schema: dict, parsed_name: str = "parsed"
) -> tuple[DataFrame, DataFrame]:
    """Batch-wise accept/reject on JSON validity — the engine's analogue of
    the reference raising ValidationError per document: (valid_rows with the
    typed struct, invalid_rows unchanged for quarantine/inspection)."""
    tagged = parse_json_col(df, json_col, schema, parsed_name=parsed_name)
    good = tagged.filter(F.col("is_valid")).drop("is_valid")
    bad = tagged.filter(~F.col("is_valid")).drop("is_valid", parsed_name)
    return good, bad


def extract_required(
    df: DataFrame, json_col: str, schema: dict
) -> DataFrame:
    """get_metadata_from_tags (json_operations.py:162-189): pull every
    required leaf (including one nested-object level, e.g.
    MicroManagerMetadata.Slice) into a top-level typed column named after
    the leaf key — the `meta_required` dict as columns."""
    tagged = parse_json_col(df, json_col, schema)
    cols = [F.col(c) for c in df.columns]
    for path in _required_paths(schema):
        leaf = path.split(".")[-1]
        cols.append(F.col(f"parsed.{path}").alias(leaf))
    cols.append(F.col("is_valid"))
    return tagged.select(*cols)


def global_json_from_tags(
    df: DataFrame,
    file_col: str = "file_path",
    tags_col: str = "tags_json",
) -> DataFrame:
    """`get_global_json` (json_operations.py:192-211) + its first-page
    application (ometif_splitter.py:169-173): global dataset metadata =
    file origin + the IJMetadata `Info` tag, which MicroManager stores
    EITHER as a nested JSON object OR as a JSON-encoded string of one —
    the reference branch `if isinstance(meta_temp, str): json.loads(...)`.

    `get_json_object('$.IJMetadata.Info')` normalizes both forms to the
    inner JSON text in one pass (object values serialize, string values
    unescape), so no Python and no double parse. Adds:
    - `global_json`: '{"file_origin": <path>, "IJMetadata": <info>}'
    - `ij_valid`: false where IJMetadata is absent or Info is not a JSON
      document (the reference's "Can't read IJMetadata" ValueError,
      batch-wise).
    Callers splitting multi-page TIFFs apply this to page_idx == 0 rows
    only — IJMetadata exists only on the first page."""
    info = F.get_json_object(F.col(tags_col), "$.IJMetadata.Info")
    # info is a JSON document iff a root-path extraction on it succeeds
    is_doc = info.isNotNull() & F.get_json_object(info, "$").isNotNull()
    # JSON-escape the path (backslash then quote; other control chars don't
    # occur in storage keys) — to_json only accepts struct/map/array input
    esc = F.regexp_replace(
        F.regexp_replace(F.col(file_col), r"\\", r"\\\\"), '"', '\\\\"'
    )
    return df.withColumn(
        "global_json",
        F.when(
            is_doc,
            F.concat(
                F.lit('{"file_origin": "'),
                esc,
                F.lit('", "IJMetadata": '),
                info,
                F.lit("}"),
            ),
        ),
    ).withColumn("ij_valid", is_doc)


def read_json(
    spark: SparkSession, path: str, schema: dict, multiline: bool = False
) -> DataFrame:
    """read_json_file (json_operations.py:101-130) as a distributed source:
    explicit compiled schema (no inference scan), PERMISSIVE mode with
    `_corrupt_record` capturing unparseable lines instead of failing the
    job. Callers filter `_corrupt_record IS NOT NULL` for the reject set
    (Spark requires cache()/persist() before a query that references ONLY
    the corrupt column — QUERY_ONLY_CORRUPT_RECORD_COLUMN)."""
    struct = compile_schema(schema).add("_corrupt_record", T.StringType())
    return (
        spark.read.schema(struct)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("multiLine", multiline)
        .json(path)
    )


def write_json(df: DataFrame, path: str) -> None:
    """write_json_file (json_operations.py:133-142) as a distributed sink:
    one JSON object per row."""
    df.write.mode("overwrite").json(path)
