"""Composed pretraining pipeline: stage invariants that must hold for ANY
corpus — survivors carry no duplicate content, no unverified near-dup
pair, no benchmark contamination, caps respected, sharding deterministic
and contiguous."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from imagingdb_spark import pipelines as P

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pipeline_out(spark):
    shards, audit = P.pretraining_pipeline(spark, SF_DIR)
    rows = shards.collect()
    spark.catalog.clearCache()
    return rows, audit


class TestAudit:
    def test_counts_monotone_and_chained(self, pipeline_out):
        rows, audit = pipeline_out
        assert [a.stage for a in audit] == [
            "quality_filter",
            "exact_dedup",
            "near_dedup",
            "decontaminate",
            "source_cap",
        ]
        for a in audit:
            assert a.rows_out <= a.rows_in
        for prev, nxt in zip(audit, audit[1:]):
            assert nxt.rows_in == prev.rows_out
        assert len(rows) == audit[-1].rows_out > 0


class TestSurvivorInvariants:
    def test_no_duplicate_content(self, pipeline_out):
        rows, _ = pipeline_out
        texts = [r["text"] for r in rows]
        assert len(texts) == len(set(texts))

    def test_no_surviving_near_dup_pair(self, spark, pipeline_out):
        """Cluster-min keepers can never be near-dups of each other — a
        verified pair between them would have merged their clusters."""
        rows, _ = pipeline_out
        from imagingdb_spark.operators.dedup import minhash_pairs

        survivors = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
        )
        assert minhash_pairs(survivors).count() == 0
        spark.catalog.clearCache()

    def test_no_benchmark_contamination(self, spark, pipeline_out):
        rows, _ = pipeline_out
        from imagingdb_spark.catalog import table
        from imagingdb_spark.operators.dedup import CONTAM_K, shingle_frame

        assert all(r["doc_id"] % 97 != 0 for r in rows)
        bench = (
            shingle_frame(
                table(spark, SF_DIR, "documents").filter(
                    F.col("doc_id") % 97 == 0
                ),
                k=CONTAM_K,
            )
            .select(F.explode("shingles").alias("g"))
            .distinct()
        )
        survivors = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
        )
        overlap = (
            shingle_frame(survivors, k=CONTAM_K)
            .select(F.explode("shingles").alias("g"))
            .join(bench, "g")
            .count()
        )
        assert overlap == 0
        spark.catalog.clearCache()

    def test_source_cap_respected(self, pipeline_out):
        from collections import Counter

        rows, _ = pipeline_out
        per_source = Counter(r["source"] for r in rows)
        assert max(per_source.values()) <= P.PIPELINE_SOURCE_CAP

    def test_quality_rules_hold(self, pipeline_out):
        rows, _ = pipeline_out
        for r in rows:
            toks = r["text"].lower().split()
            assert len(toks) >= 10


class TestSharding:
    def test_positions_contiguous_per_shard(self, pipeline_out):
        from collections import defaultdict

        rows, _ = pipeline_out
        by_shard = defaultdict(list)
        for r in rows:
            by_shard[r["shard"]].append(r["pos_in_shard"])
        for shard, ps in by_shard.items():
            assert sorted(ps) == list(range(1, len(ps) + 1)), shard

    def test_deterministic(self, spark, pipeline_out):
        rows, audit = pipeline_out
        shards2, audit2 = P.pretraining_pipeline(spark, SF_DIR)
        rows2 = shards2.collect()
        spark.catalog.clearCache()
        key = lambda r: (r["shard"], r["pos_in_shard"], r["doc_id"])  # noqa: E731
        assert sorted(map(key, rows)) == sorted(map(key, rows2))
        assert audit == audit2


class TestEmptyCorpus:
    def test_pipeline_survives_empty_documents(self, spark, tmp_path):
        """Every stage must tolerate a 0-row corpus (fresh deployments,
        fully-filtered partitions): empty output, zeroed audit, no
        crash."""
        import pyspark.sql.types as T

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
                T.StructField("lang", T.StringType()),
                T.StructField("source", T.StringType()),
                T.StructField("n_chars", T.LongType()),
            ]
        )
        d = str(tmp_path / "sfempty")
        spark.createDataFrame([], schema).write.parquet(f"{d}/documents.parquet")
        shards, audit = P.pretraining_pipeline(spark, d)
        assert shards.count() == 0
        assert all(a.rows_in == 0 and a.rows_out == 0 for a in audit)
        spark.catalog.clearCache()
