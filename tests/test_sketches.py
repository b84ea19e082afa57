"""Mergeable HLL sketches: JVM-vs-numpy bit parity, estimator accuracy,
merge algebra, and the streaming job's exact parity with the batch twin
(operators/sketches.py + streaming_distinct_hll)."""

from __future__ import annotations

import numpy as np

from imagingdb_spark.operators import sketches as SK

SF_DIR = "/root/testdata/sf0.001"


class TestRegisterMath:
    def test_numpy_estimate_accuracy_sweep(self):
        """Reference-twin accuracy: across four decades of true
        cardinality, the estimate stays within 5% (expected sigma ~1.6%
        at 2^12 registers)."""
        rng = np.random.RandomState(7)
        for n in (100, 1_000, 10_000, 100_000):
            hashes = rng.randint(-(2**63), 2**63 - 1, size=n, dtype=np.int64)
            est = SK.estimate_np(SK.registers_from_hashes(hashes))
            assert abs(est - n) / n < 0.05, (n, est)

    def test_jvm_registers_bit_match_numpy(self, spark):
        """The JVM rank trick (65 - length(bin(w)), two's-complement for
        negatives) must reproduce the numpy reference register-for-
        register on real hashes — including the w<0 and w==0 paths."""
        from pyspark.sql import functions as F

        df = spark.range(50_000).select(F.col("id").cast("string").alias("k"))
        rows = SK.hll_partials(df.withColumn("g", F.lit(1)), "k", ["g"]).collect()
        hashes = np.array(
            [r["h"] for r in df.select(F.xxhash64("k").alias("h")).collect()],
            dtype=np.int64,
        )
        spark.catalog.clearCache()
        want = SK.registers_from_hashes(hashes)
        got = np.zeros(SK.HLL_M, np.uint8)
        for r in rows:
            got[r["reg_idx"]] = r["rank"]
        assert np.array_equal(got, want)
        # forced w==0 edge: a hash whose low 52 bits are zero caps at
        # the max rank (numpy path; the JVM CASE mirrors it)
        h0 = np.array([1 << 52], dtype=np.int64)
        assert SK.registers_from_hashes(h0).max() == 64 - SK.HLL_P + 1

    def test_merge_equals_whole_and_is_idempotent(self, spark):
        from pyspark.sql import functions as F

        df = spark.range(20_000).select(
            F.col("id").cast("string").alias("k"),
            (F.col("id") < 7_000).alias("half"),
            F.lit(1).alias("g"),
        )
        whole = SK.hll_partials(df, "k", ["g"])
        a = SK.hll_partials(df.filter("half"), "k", ["g"])
        b = SK.hll_partials(df.filter("NOT half"), "k", ["g"])
        merged = SK.hll_merge(a, b, ["g"])
        key = lambda rows: sorted((r["reg_idx"], r["rank"]) for r in rows)
        w = key(whole.collect())
        assert key(merged.collect()) == w
        # idempotent: re-merging an absorbed part changes nothing
        assert key(SK.hll_merge(merged, a, ["g"]).collect()) == w
        spark.catalog.clearCache()

    def test_duplicates_do_not_move_registers(self, spark):
        from pyspark.sql import functions as F

        df = spark.range(5_000).select(F.col("id").cast("string").alias("k"),
                                       F.lit(1).alias("g"))
        once = SK.hll_partials(df, "k", ["g"]).collect()
        thrice = SK.hll_partials(df.union(df).union(df), "k", ["g"]).collect()
        key = lambda rows: sorted((r["reg_idx"], r["rank"]) for r in rows)
        assert key(once) == key(thrice)
        spark.catalog.clearCache()


class TestBatchTwin:
    def test_accuracy_vs_exact_per_group(self, spark):
        from pyspark.sql import functions as F

        e = spark.read.parquet(SF_DIR + "/events.parquet").select(
            F.date_trunc("hour", "ts").alias("w"), "event_type", "user_id"
        )
        got = {
            (r["w"], r["event_type"]): r["approx_distinct"]
            for r in SK.hll_distinct(e, "user_id", ["w", "event_type"]).collect()
        }
        want = {
            (r["w"], r["event_type"]): r["n"]
            for r in e.groupBy("w", "event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        spark.catalog.clearCache()
        assert set(got) == set(want)
        for k, n in want.items():
            assert abs(got[k] - n) <= max(2, 0.06 * n), (k, n, got[k])

    def test_registered_query_runs_and_is_deterministic(self, spark):
        from imagingdb_spark.operators.sketches import st_distinct_hll

        a = sorted(map(tuple, st_distinct_hll(spark, SF_DIR).collect()))
        b = sorted(map(tuple, st_distinct_hll(spark, SF_DIR).collect()))
        spark.catalog.clearCache()
        assert a == b and len(a) > 0


class TestStreaming:
    def test_retention_bounds_the_manifest_log(self, spark, tmp_path):
        """With expire_every=2 over 6 micro-batches, the state table must
        end with a bounded manifest log and vacuumed old rewrites while
        the register state stays exactly the full-data sketch."""
        from pyspark.sql import functions as F

        from imagingdb_spark import snapshots as S
        from imagingdb_spark.streaming import jobs

        src = str(tmp_path / "src")
        events = spark.read.parquet(SF_DIR + "/events.parquet").select(
            "ts", "event_type", "user_id"
        )
        for i in range(6):
            events.filter(F.col("user_id") % 6 == i).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        table = str(tmp_path / "state")
        q = jobs.streaming_distinct_hll(
            stream, table, str(tmp_path / "ck"),
            expire_every=2, keep_versions=2,
        )
        q.processAllAvailable()
        q.stop()
        versions = S.snapshot_versions(table)
        assert len(versions) <= 4  # expired down; never 1-per-trigger
        # vacuum reclaimed the expired rewrites: data dirs ≈ retained versions
        import os
        n_data_dirs = len(os.listdir(os.path.join(table, "data")))
        assert n_data_dirs <= len(versions) + 1
        # state still exactly the full-data sketch
        batch = spark.read.parquet(SF_DIR + "/events.parquet").select(
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_type",
            "user_id",
        )
        key = lambda rows: sorted(
            (r["window_start"], r["event_type"], r["reg_idx"], r["rank"])
            for r in rows
        )
        want = key(SK.hll_partials(
            batch, "user_id", ["window_start", "event_type"]).collect())
        assert key(S.snapshot_read(spark, table).collect()) == want
        spark.catalog.clearCache()

    def test_stream_state_matches_batch_and_replays_clean(
        self, spark, tmp_path
    ):
        """The streaming job's merged register state must equal the batch
        twin's registers EXACTLY (same hashes, same max-algebra), and a
        full fresh-checkpoint replay must leave it untouched."""
        from pyspark.sql import functions as F

        from imagingdb_spark import snapshots as S
        from imagingdb_spark.streaming import jobs

        table = str(tmp_path / "hll_state")

        def run(ck):
            stream = jobs.read_events_stream(spark, SF_DIR)
            q = jobs.streaming_distinct_hll(stream, table, str(tmp_path / ck))
            q.processAllAvailable()
            q.stop()

        run("ck1")
        batch = spark.read.parquet(SF_DIR + "/events.parquet").select(
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_type",
            "user_id",
        )
        key = lambda rows: sorted(
            (r["window_start"], r["event_type"], r["reg_idx"], r["rank"])
            for r in rows
        )
        want = key(
            SK.hll_partials(
                batch, "user_id", ["window_start", "event_type"]
            ).collect()
        )
        assert key(S.snapshot_read(spark, table).collect()) == want

        run("ck2")  # full replay: union-max is idempotent -> same rows
        assert key(S.snapshot_read(spark, table).collect()) == want

        # retention ran (expire_every default 8 < batch count x 2 runs):
        # the manifest log stays bounded instead of one-version-per-
        # trigger-forever, and old full-state rewrites were vacuumed
        versions = S.snapshot_versions(table)
        assert len(versions) <= 8 + 4

        # the read side agrees with the batch twin's estimates exactly
        est = {
            (r["window_start"], r["event_type"]): r["approx_distinct"]
            for r in jobs.hll_estimates(spark, table).collect()
        }
        twin = {
            (r["window_start"], r["event_type"]): r["approx_distinct"]
            for r in SK.hll_distinct(
                batch, "user_id", ["window_start", "event_type"]
            ).collect()
        }
        spark.catalog.clearCache()
        assert est == twin
