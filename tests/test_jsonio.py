"""JSON source + schema validation tests (SURVEY.md §2.1 S3) — behavior
mirrored from the reference's tests/metadata/json_operations_tests.py:
valid doc passes, missing required key fails, wrong type fails, malformed
string fails (str2json ValueError → here is_valid=false / _corrupt_record)."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from imagingdb_spark import ingest, jsonio

GOOD_MM = {
    "MicroManagerMetadata": {
        "ChannelIndex": 4,
        "Slice": 1,
        "FrameIndex": 0,
        "PositionIndex": 2,
        "Channel": "phase",
        "Exposure-ms": 50.5,
    }
}
NO_SLICE = {
    "MicroManagerMetadata": {
        "ChannelIndex": 4,
        "FrameIndex": 0,
        "PositionIndex": 2,
        "Channel": "phase",
    }
}
WRONG_TYPE = {
    "MicroManagerMetadata": {
        "ChannelIndex": "not-an-int",
        "Slice": 1,
        "FrameIndex": 0,
        "PositionIndex": 2,
        "Channel": "phase",
    }
}


def test_compile_schema_nested():
    struct = jsonio.compile_schema(jsonio.MICROMETA_SCHEMA)
    mm = struct["MicroManagerMetadata"].dataType
    assert isinstance(mm, T.StructType)
    assert isinstance(mm["ChannelIndex"].dataType, T.LongType)
    assert isinstance(mm["Channel"].dataType, T.StringType)
    assert isinstance(mm["Exposure-ms"].dataType, T.DoubleType)


def test_compile_schema_credentials_flat():
    struct = jsonio.compile_schema(jsonio.CREDENTIALS_SCHEMA)
    assert isinstance(struct["port"].dataType, T.LongType)
    assert isinstance(struct["host"].dataType, T.StringType)


def test_compile_schema_rejects_unknown_type():
    with pytest.raises(ValueError, match="unsupported"):
        jsonio.compile_schema(
            {"type": "object", "properties": {"x": {"type": "wat"}}}
        )


@pytest.fixture()
def mm_df(spark):
    rows = [
        (1, json.dumps(GOOD_MM)),
        (2, json.dumps(NO_SLICE)),       # missing required → invalid
        (3, json.dumps(WRONG_TYPE)),     # type mismatch → invalid
        (4, "{truncated"),               # malformed → invalid
        (5, None),                       # null doc → invalid
    ]
    return spark.createDataFrame(rows, "id long, metadata_json string")


def test_validity_matches_jsonschema_required(mm_df):
    tagged = jsonio.parse_json_col(mm_df, "metadata_json", jsonio.MICROMETA_SCHEMA)
    got = {r["id"]: r["is_valid"] for r in tagged.collect()}
    assert got == {1: True, 2: False, 3: False, 4: False, 5: False}


def test_split_valid(mm_df):
    good, bad = jsonio.split_valid(mm_df, "metadata_json", jsonio.MICROMETA_SCHEMA)
    assert [r["id"] for r in good.orderBy("id").collect()] == [1]
    assert [r["id"] for r in bad.orderBy("id").collect()] == [2, 3, 4, 5]
    # valid side carries the typed struct; reject side keeps original cols only
    assert good.select("parsed.MicroManagerMetadata.Slice").first()[0] == 1
    assert "parsed" not in bad.columns


def test_extract_required_flattens_nested_leaves(mm_df):
    out = jsonio.extract_required(mm_df, "metadata_json", jsonio.MICROMETA_SCHEMA)
    row = out.filter(F.col("id") == 1).first()
    assert row["ChannelIndex"] == 4
    assert row["Slice"] == 1
    assert row["Channel"] == "phase"
    # Exposure-ms is optional → not extracted as required
    assert "Exposure-ms" not in out.columns


def test_read_json_explicit_schema_and_corrupt_record(spark, tmp_path):
    p = tmp_path / "docs.json"
    p.write_text(
        json.dumps({"upload_type": "frames", "microscope": "scope1"})
        + "\n{not json\n"
        + json.dumps({"upload_type": "file", "microscope": "scope2"})
        + "\n"
    )
    # Spark requires materializing before filtering on ONLY _corrupt_record
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache() per its own guidance
    df = jsonio.read_json(spark, str(p), jsonio.CONFIG_SCHEMA).cache()
    assert df.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    ok = df.filter(F.col("_corrupt_record").isNull())
    assert sorted(r["microscope"] for r in ok.collect()) == ["scope1", "scope2"]


def test_ingest_rejects_invalid_metadata(spark):
    frames = spark.createDataFrame(
        [
            (1, json.dumps(GOOD_MM)),
            (2, "{broken"),
            (3, json.dumps(NO_SLICE)),
        ],
        "id long, metadata_json string",
    )
    good, bad = ingest.reject_invalid_metadata(frames)
    assert [r["id"] for r in good.collect()] == [1]
    assert sorted(r["id"] for r in bad.collect()) == [2, 3]


class TestGlobalJsonFromTags:
    """get_global_json parity (json_operations.py:192-211): Info as nested
    object AND as JSON-encoded string both normalize; absent/undecodable
    IJMetadata maps to ij_valid=false (the reference's ValueError)."""

    def _run(self, spark, tags):
        df = spark.createDataFrame(
            [(f"/data/f{i}.ome.tif", t) for i, t in enumerate(tags)],
            "file_path string, tags_json string",
        )
        return jsonio.global_json_from_tags(df).orderBy("file_path").collect()

    def test_object_and_string_encoded_info_normalize(self, spark):
        obj_form = json.dumps(
            {"IJMetadata": {"Info": {"channels": 2, "scope": "s1"}}}
        )
        str_form = json.dumps(
            {"IJMetadata": {"Info": json.dumps({"channels": 2, "scope": "s1"})}}
        )
        rows = self._run(spark, [obj_form, str_form])
        for r in rows:
            assert r["ij_valid"] is True
            parsed = json.loads(r["global_json"])
            assert parsed["IJMetadata"] == {"channels": 2, "scope": "s1"}
            assert parsed["file_origin"].endswith(".ome.tif")

    def test_missing_or_plain_text_info_invalid(self, spark):
        rows = self._run(
            spark,
            [
                json.dumps({"OtherTag": 1}),                     # no IJMetadata
                json.dumps({"IJMetadata": {"Info": "plain text"}}),  # not JSON
            ],
        )
        assert [r["ij_valid"] for r in rows] == [False, False]
        assert all(r["global_json"] is None for r in rows)


def test_write_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    dest = str(tmp_path / "out.json")
    jsonio.write_json(df, dest)
    back = spark.read.schema("id long, v string").json(dest)
    assert sorted((r["id"], r["v"]) for r in back.collect()) == [(1, "a"), (2, "b")]
