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


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters, continuous (operators/text.py mg_* +
# streaming_heavy_hitters): superset guarantee, fold determinism, stream ==
# batch-fold parity, and the txn-gated replay screen (the NON-idempotent
# asymmetry vs the HLL register max).
# ---------------------------------------------------------------------------


def _mg_batches(spark, n=4):
    """The same deterministic batch split st_heavy_hitters simulates."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(SF_DIR + "/documents.parquet").select(
        "doc_id", "text"
    )
    return [d.filter(F.pmod("doc_id", F.lit(n)) == i) for i in range(n)]


def _fold_state(spark, batches):
    from pyspark.sql import functions as F

    from imagingdb_spark.operators import text as TX

    state = None
    for b in batches:
        toks = b.select(F.explode(TX.tokens_col(F.col("text"))).alias("tok"))
        p = TX.mg_batch_partial(toks)
        # batch 0 folds from an empty state, like the streaming job
        state = TX.mg_merge_state(p.limit(0) if state is None else state, p)
    return state


class TestHeavyHittersSketch:
    def test_superset_of_exact_heavies_with_bounded_undercount(self, spark):
        """Every EXACT phi-heavy token must appear in the read-out
        (no-false-negative), and each reported cnt_min must underestimate
        its true count by at most N/(k+1)."""
        from pyspark.sql import functions as F

        from imagingdb_spark.operators import text as TX

        d = spark.read.parquet(SF_DIR + "/documents.parquet")
        toks = d.select(F.explode(TX.tokens_col(F.col("text"))).alias("tok"))
        exact = {r["tok"]: r["n"] for r in toks.groupBy("tok")
                 .agg(F.count(F.lit(1)).alias("n")).collect()}
        n_total = sum(exact.values())
        heavies = {t for t, n in exact.items() if n >= TX.HH_PHI * n_total}

        got = {r["tok"]: r["cnt_min"]
               for r in TX.mg_heavy_hitters(
                   _fold_state(spark, _mg_batches(spark))).collect()}
        spark.catalog.clearCache()
        assert heavies <= set(got), heavies - set(got)
        bound = n_total / (TX.HH_SKETCH_K + 1)
        for t, c in got.items():
            assert c <= exact[t], (t, c, exact[t])          # never overcount
            assert exact[t] - c <= bound + 1, (t, c, exact[t])

    def test_state_stays_bounded_and_total_exact(self, spark):
        from pyspark.sql import functions as F

        from imagingdb_spark.operators import text as TX

        state = _fold_state(spark, _mg_batches(spark)).collect()
        counters = [r for r in state if r["tok"] != TX.MG_TOTAL]
        totals = [r for r in state if r["tok"] == TX.MG_TOTAL]
        assert len(counters) <= TX.HH_SKETCH_K
        d = spark.read.parquet(SF_DIR + "/documents.parquet")
        n_total = d.select(
            F.sum(F.size(TX.tokens_col(F.col("text"))))
        ).collect()[0][0]
        spark.catalog.clearCache()
        assert len(totals) == 1 and totals[0]["cnt"] == n_total

    def test_registered_query_runs_and_is_deterministic(self, spark):
        from imagingdb_spark.operators.text import st_heavy_hitters

        a = sorted(map(tuple, st_heavy_hitters(spark, SF_DIR).collect()))
        b = sorted(map(tuple, st_heavy_hitters(spark, SF_DIR).collect()))
        spark.catalog.clearCache()
        assert a == b and len(a) > 0

    def test_stream_state_matches_batch_fold_and_replays_clean(
        self, spark, tmp_path
    ):
        """streaming_heavy_hitters over the same 4 batches (mtime-pinned
        file order) must land the exact batch-fold state; a fresh-
        checkpoint FULL REPLAY must leave it untouched — which for this
        non-idempotent fold is the txn gate working, not algebra."""
        import os
        import time

        from imagingdb_spark import snapshots as S
        from imagingdb_spark.streaming import jobs

        import glob
        import shutil

        src = str(tmp_path / "src")
        os.makedirs(src)
        for i, b in enumerate(_mg_batches(spark)):
            tmp = str(tmp_path / f"stage{i}")
            b.coalesce(1).write.parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(src, f"b{i}.parquet")
            shutil.copyfile(part, dst)
            t = time.time() + i * 10  # pin source order = fold order
            os.utime(dst, (t, t))

        table = str(tmp_path / "mg_state")

        def run(ck):
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = jobs.streaming_heavy_hitters(
                stream, table, str(tmp_path / ck)
            )
            q.processAllAvailable()
            q.stop()

        run("ck1")
        key = lambda rows: sorted((r["tok"], r["cnt"]) for r in rows)
        want = key(_fold_state(spark, _mg_batches(spark)).collect())
        assert key(S.snapshot_read(spark, table).collect()) == want

        run("ck2")  # fresh checkpoint: every batch_id re-fires; the txn
        #             marker screens each one BEFORE the fold
        assert key(S.snapshot_read(spark, table).collect()) == want

        # read side == batch twin read-out
        got = sorted(map(tuple,
                     jobs.heavy_hitter_estimates(spark, table).collect()))
        from imagingdb_spark.operators.text import mg_heavy_hitters
        twin = sorted(map(tuple, mg_heavy_hitters(
            _fold_state(spark, _mg_batches(spark))).collect()))
        spark.catalog.clearCache()
        assert got == twin

    def test_rmw_txn_marker_screens_replays(self, spark, tmp_path):
        """The primitive itself: a snapshot_rmw re-run with an already-
        recorded (app, seq) must skip the transform entirely."""
        from imagingdb_spark import snapshots as S

        t = str(tmp_path / "t")
        S.snapshot_commit(
            spark, t, spark.createDataFrame([(1,)], "v long")
        )
        calls = []

        def double(df):
            calls.append(1)
            return df.selectExpr("v * 2 AS v")

        v1 = S.snapshot_rmw(spark, t, double, txn=("app", 0))
        v2 = S.snapshot_rmw(spark, t, double, txn=("app", 0))  # replay
        assert v1 == v2 == 2 and len(calls) == 1
        assert [r["v"] for r in S.snapshot_read(spark, t).collect()] == [2]
        v3 = S.snapshot_rmw(spark, t, double, txn=("app", 1))  # next batch
        assert v3 == 3 and len(calls) == 2
        assert [r["v"] for r in S.snapshot_read(spark, t).collect()] == [4]


# ---------------------------------------------------------------------------
# DDSketch quantiles (operators/sketches.py dd_* + streaming_quantiles):
# relative-error bound vs exact, JVM-vs-numpy bucket parity, merge == whole,
# stream == batch parity with the txn-gated replay screen.
# ---------------------------------------------------------------------------


class TestQuantileSketch:
    def test_relative_error_bound_vs_exact(self, spark):
        """p50/p90/p99 off the sketch must sit within DD_ALPHA relative
        error of the exact quantiles — positives, negatives, and zeros."""
        import numpy as np
        from pyspark.sql import functions as F

        rng = np.random.RandomState(11)
        vals = np.concatenate([
            rng.lognormal(4, 2, 20_000),            # heavy-tailed positives
            -rng.lognormal(2, 1, 5_000),            # negatives
            np.zeros(500),
        ])
        df = spark.createDataFrame(
            [(float(v),) for v in vals], "v double"
        ).withColumn("g", F.lit(1))
        qs = [0.05, 0.25, 0.5, 0.9, 0.99]
        got = {r["q"]: r["value"] for r in SK.dd_quantiles(
            SK.dd_partials(df, "v", ["g"]), ["g"], qs).collect()}
        spark.catalog.clearCache()
        svals = np.sort(vals)
        for q in qs:
            true = svals[int(np.ceil(q * len(svals))) - 1]
            if true == 0:
                assert got[q] == 0.0
            else:
                rel = abs(got[q] - true) / abs(true)
                assert rel <= SK.DD_ALPHA + 1e-9, (q, true, got[q], rel)

    def test_jvm_buckets_match_numpy(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        rng = np.random.RandomState(3)
        vals = np.concatenate(
            [rng.lognormal(0, 3, 5_000), -rng.lognormal(0, 3, 1_000),
             np.zeros(7)]
        )
        df = spark.createDataFrame(
            [(float(v),) for v in vals], "v double"
        ).withColumn("g", F.lit(1))
        got = {(r["sign"], r["bkt"]): r["cnt"]
               for r in SK.dd_partials(df, "v", ["g"]).collect()}
        spark.catalog.clearCache()
        assert got == SK.dd_bucket_np(vals)
        # and the rank selection agrees with the numpy twin
        for q in (0.1, 0.5, 0.95):
            jvm = SK.dd_quantiles(
                SK.dd_partials(df, "v", ["g"]), ["g"], [q]
            ).collect()[0]["value"]
            assert jvm == SK.dd_quantile_np(SK.dd_bucket_np(vals), q)

    def test_merge_equals_whole(self, spark):
        from pyspark.sql import functions as F

        df = spark.range(30_000).select(
            (F.col("id") % 997 + 1).cast("double").alias("v"),
            (F.col("id") < 11_000).alias("half"),
            F.lit(1).alias("g"),
        )
        whole = SK.dd_partials(df, "v", ["g"])
        merged = SK.dd_merge(
            SK.dd_partials(df.filter("half"), "v", ["g"]),
            SK.dd_partials(df.filter("NOT half"), "v", ["g"]),
            ["g"],
        )
        key = lambda rows: sorted(
            (r["sign"], r["bkt"], r["cnt"]) for r in rows)
        assert key(merged.collect()) == key(whole.collect())
        spark.catalog.clearCache()

    def test_registered_query_runs_and_is_deterministic(self, spark):
        from imagingdb_spark.operators.sketches import st_quantiles

        a = sorted(map(tuple, st_quantiles(spark, SF_DIR).collect()))
        b = sorted(map(tuple, st_quantiles(spark, SF_DIR).collect()))
        spark.catalog.clearCache()
        assert a == b and len(a) > 0

    def test_stream_state_matches_batch_and_replays_clean(
        self, spark, tmp_path
    ):
        """streaming_quantiles folds to exactly the one-shot batch sketch
        (bucket sums are order-free), and a fresh-checkpoint full replay
        leaves the state untouched — the txn gate, since a double-applied
        bucket sum would double every count."""
        from pyspark.sql import functions as F

        from imagingdb_spark import snapshots as S
        from imagingdb_spark.streaming import jobs

        src = str(tmp_path / "src")
        li = spark.read.parquet(SF_DIR + "/lineitem.parquet").select(
            "l_returnflag", "l_extendedprice"
        )
        # 4 batches split by a hash of the price (no orderkey carried)
        for i in range(4):
            li.filter(F.pmod(F.abs(F.xxhash64("l_extendedprice")), F.lit(4)) == i) \
                .coalesce(1).write.mode("append").parquet(src)

        table = str(tmp_path / "dd_state")

        def run(ck):
            stream = (
                spark.readStream.schema(
                    "l_returnflag string, l_extendedprice double"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = jobs.streaming_quantiles(
                stream, table, str(tmp_path / ck),
                "l_extendedprice", ("l_returnflag",),
            )
            q.processAllAvailable()
            q.stop()

        run("ck1")
        key = lambda rows: sorted(
            (r["l_returnflag"], r["sign"], r["bkt"], r["cnt"]) for r in rows)
        want = key(SK.dd_partials(
            li, "l_extendedprice", ["l_returnflag"]).collect())
        assert key(S.snapshot_read(spark, table).collect()) == want

        run("ck2")  # full replay screened by the txn marker
        assert key(S.snapshot_read(spark, table).collect()) == want

        # read side == batch twin
        got = sorted(map(tuple, jobs.quantile_estimates(
            spark, table, [0.5, 0.9, 0.99]).collect()))
        twin = sorted(map(tuple, SK.dd_quantiles(
            SK.dd_partials(li, "l_extendedprice", ["l_returnflag"]),
            ["l_returnflag"], [0.5, 0.9, 0.99]).collect()))
        spark.catalog.clearCache()
        assert got == twin


# ---------------------------------------------------------------------------
# KMV / theta sketches (operators/sketches.py kmv_* + streaming_theta_sketch):
# exact-when-partial parity, error bounds at forced-full sketches, merge
# algebra (idempotent — the HLL side of the replay-safety dichotomy), python
# twin parity, stream == batch with a NO-txn replay (algebra, not bookkeeping).
# ---------------------------------------------------------------------------


class TestThetaSketch:
    def test_exact_when_population_fits(self, spark):
        """Sketches that never filled (n < k) are exact: estimates equal
        the true distincts and intersections on the real events table."""
        from pyspark.sql import functions as F

        e = spark.read.parquet(SF_DIR + "/events.parquet").select(
            "event_type", "user_id"
        )
        sk = SK.kmv_partials(e, "user_id", ["event_type"])
        got = {(r["g_a"], r["g_b"]): r for r in
               SK.kmv_overlaps(sk, "event_type").collect()}
        types = [r[0] for r in e.select("event_type").distinct().collect()]
        users = {
            t: {r[0] for r in e.filter(F.col("event_type") == t)
                .select("user_id").distinct().collect()}
            for t in types
        }
        spark.catalog.clearCache()
        for (a, b), r in got.items():
            assert r["common_est"] == len(users[a] & users[b])
            assert r["distinct_a_est"] == len(users[a])
            assert r["distinct_b_est"] == len(users[b])

    def test_error_bound_when_full(self, spark):
        """Forced-full sketches (50k+50k keys, 10k overlap, k=1024): the
        distinct and intersection estimates land within ~5 standard errors
        (1/sqrt(k-2) ~ 3.1%)."""
        from pyspark.sql import functions as F

        a = spark.range(0, 50_000).select(
            F.lit("A").alias("g"), F.col("id").cast("string").alias("k"))
        b = spark.range(40_000, 90_000).select(
            F.lit("B").alias("g"), F.col("id").cast("string").alias("k"))
        sk = SK.kmv_partials(a.union(b), "k", ["g"])
        est = {r["g_a"]: r for r in SK.kmv_overlaps(sk, "g").collect()}["A"]
        d = {r["g"]: r["approx_distinct"]
             for r in SK.kmv_estimate_df(sk, ["g"]).collect()}
        spark.catalog.clearCache()
        assert abs(d["A"] - 50_000) / 50_000 < 0.16
        assert abs(d["B"] - 50_000) / 50_000 < 0.16
        # intersection error compounds (scaled count of ~k/5 samples):
        # allow a wider, still-tight band
        assert abs(est["common_est"] - 10_000) / 10_000 < 0.25
        true_j = 10_000 / 90_000
        assert abs(est["jaccard_est"] - true_j) / true_j < 0.25

    def test_merge_equals_whole_and_is_idempotent(self, spark):
        from pyspark.sql import functions as F

        df = spark.range(30_000).select(
            F.col("id").cast("string").alias("k"),
            (F.col("id") < 11_000).alias("half"),
            F.lit(1).alias("g"),
        )
        whole = SK.kmv_partials(df, "k", ["g"])
        a = SK.kmv_partials(df.filter("half"), "k", ["g"])
        b = SK.kmv_partials(df.filter("NOT half"), "k", ["g"])
        merged = SK.kmv_merge(a, b, ["g"])
        key = lambda rows: sorted(r["u"] for r in rows)
        w = key(whole.collect())
        assert key(merged.collect()) == w
        assert key(SK.kmv_merge(merged, a, ["g"]).collect()) == w  # idempotent
        spark.catalog.clearCache()

    def test_python_twin_parity(self, spark):
        from pyspark.sql import functions as F

        df = spark.range(5_000).select(
            F.col("id").cast("string").alias("k"), F.lit(1).alias("g"))
        jvm = sorted(int(r["u"]) for r in
                     SK.kmv_partials(df, "k", ["g"]).collect())
        hashes = [r["h"] for r in
                  df.select(F.xxhash64("k").alias("h")).collect()]
        spark.catalog.clearCache()
        assert jvm == SK.kmv_sketch_py(hashes)
        # and the overlap estimator agrees with the python rule
        est = SK.kmv_overlap_py(jvm, jvm)
        assert round(est) == len(jvm) if len(jvm) < SK.KMV_K else est > 0

    def test_registered_query_runs_and_is_deterministic(self, spark):
        from imagingdb_spark.operators.sketches import st_theta_overlap

        a = sorted(map(tuple, st_theta_overlap(spark, SF_DIR).collect()))
        b = sorted(map(tuple, st_theta_overlap(spark, SF_DIR).collect()))
        spark.catalog.clearCache()
        assert a == b and len(a) > 0

    def test_stream_state_matches_batch_and_replays_by_algebra(
        self, spark, tmp_path
    ):
        """streaming_theta_sketch lands exactly the one-shot batch sample
        set; a fresh-checkpoint FULL REPLAY leaves it untouched WITHOUT
        any txn bookkeeping — the state manifests must record zero txns,
        pinning that idempotent algebra (not the marker) is what absorbs
        the replay (the deliberate contrast with the MG/DDSketch folds)."""
        from pyspark.sql import functions as F

        from imagingdb_spark import snapshots as S
        from imagingdb_spark.streaming import jobs

        src = str(tmp_path / "src")
        e = spark.read.parquet(SF_DIR + "/events.parquet").select(
            "event_type", "user_id"
        )
        for i in range(4):
            e.filter(F.pmod(F.abs(F.xxhash64("user_id")), F.lit(4)) == i) \
                .coalesce(1).write.mode("append").parquet(src)

        table = str(tmp_path / "kmv_state")

        def run(ck):
            stream = (
                spark.readStream.schema("event_type string, user_id long")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = jobs.streaming_theta_sketch(
                stream, table, str(tmp_path / ck)
            )
            q.processAllAvailable()
            q.stop()

        run("ck1")
        key = lambda rows: sorted((r["event_type"], int(r["u"]))
                                  for r in rows)
        want = key(SK.kmv_partials(e, "user_id", ["event_type"]).collect())
        assert key(S.snapshot_read(spark, table).collect()) == want

        run("ck2")  # full replay: absorbed by union+truncate idempotence
        assert key(S.snapshot_read(spark, table).collect()) == want
        # NO txn markers anywhere in the retained manifests: the algebra,
        # not bookkeeping, is the replay screen here
        for v in S._versions(table):
            assert S._read_manifest_raw(table, v).get("txns", {}) == {}

        got = sorted(map(tuple, jobs.theta_overlap_estimates(
            spark, table, "event_type").collect()))
        twin = sorted(map(tuple, SK.kmv_overlaps(
            SK.kmv_partials(e, "user_id", ["event_type"]),
            "event_type").collect()))
        spark.catalog.clearCache()
        assert got == twin


class TestHeavyHittersEdges:
    def test_first_batch_folds_through_compress(self, spark):
        """Batch 0 must fold through mg_merge_state from an EMPTY state:
        with k smaller than the first batch's distinct-token count the
        compress applies immediately (the streaming job's exact path) —
        taking the raw partial as initial state would skip it."""
        from pyspark.sql import functions as F

        from imagingdb_spark.operators import text as TX

        toks = spark.range(1000).repartition(4).select(
            F.concat(F.lit("t"), (F.col("id") % 40)).alias("tok")
        )
        p = TX.mg_batch_partial(toks, k=8)
        folded = TX.mg_merge_state(p.limit(0), p, k=8).collect()
        counters = [r for r in folded if r["tok"] != TX.MG_TOTAL]
        totals = [r for r in folded if r["tok"] == TX.MG_TOTAL]
        spark.catalog.clearCache()
        assert len(counters) <= 8  # compress ran on the very first fold
        assert totals[0]["cnt"] == 1000  # exact total untouched by compress

    def test_read_side_threshold_respects_custom_k(self, spark, tmp_path):
        """heavy_hitter_estimates(k=...) must use the stream's own k for
        the undercount bound — reading a small-k stream with the default
        bound silently shrinks the guaranteed superset. Pinned on a
        hand-built state: counter 'b' holds a residual of 8 out of
        N=400; at k=8 the threshold is (0.03 − 1/9)·400 < 0, so 'b'
        must report (its true count could be as high as 8 + 400/9 ≈ 52);
        at the default k=256 the threshold is (0.03 − 1/257)·400 ≈ 10.4
        and 'b' would be silently dropped."""
        from imagingdb_spark import snapshots as S
        from imagingdb_spark.operators.text import MG_TOTAL
        from imagingdb_spark.streaming import jobs

        table = str(tmp_path / "state")
        state = spark.createDataFrame(
            [(MG_TOTAL, 400), ("a", 150), ("b", 8)], "tok string, cnt long"
        )
        S.snapshot_commit(spark, table, state)
        wide = {r["tok"] for r in jobs.heavy_hitter_estimates(
            spark, table, phi=0.03, k=8).collect()}
        narrow = {r["tok"] for r in jobs.heavy_hitter_estimates(
            spark, table, phi=0.03).collect()}
        spark.catalog.clearCache()
        assert wide == {"a", "b"}      # the k=8 bound keeps 'b'
        assert narrow == {"a"}         # the default bound would lose it


class TestQuantileSketchEdges:
    def test_nulls_and_nans_are_ignored(self, spark):
        """percentile semantics: NULL/NaN rows must not enter the sketch —
        unfiltered they doubled n_total and dragged p50 to 0."""
        from pyspark.sql import functions as F

        vals = ([None] * 500 + [float("nan")] * 100
                + [float(i) for i in range(1, 1001)])
        df = spark.createDataFrame(
            [(v,) for v in vals], "v double"
        ).withColumn("g", F.lit(1))
        parts = SK.dd_partials(df, "v", ["g"])
        n_total = parts.agg(F.sum("cnt")).collect()[0][0]
        assert n_total == 1000  # only the real values counted
        got = {r["q"]: r["value"] for r in SK.dd_quantiles(
            parts, ["g"], [0.5]).collect()}
        spark.catalog.clearCache()
        assert abs(got[0.5] - 500) / 500 <= SK.DD_ALPHA + 1e-9


class TestQuantileCollapse:
    def test_adversarial_range_stays_bounded_upper_quantiles_exact(
        self, spark
    ):
        """A value range spanning ~260 decades (~60k natural buckets at
        1%) must collapse to <= DD_MAX_BUCKETS rows per group while p90 /
        p99 keep the full alpha guarantee; quantiles inside the collapsed
        mass report the (upward-biased, monotone) boundary floor."""
        import numpy as np
        from pyspark.sql import functions as F

        exps = np.linspace(-130, 130, 20_000)
        vals = np.power(10.0, exps)
        df = spark.createDataFrame(
            [(float(v),) for v in vals], "v double"
        ).withColumn("g", F.lit(1))
        collapsed = SK.dd_collapse(SK.dd_partials(df, "v", ["g"]), ["g"])
        n = collapsed.count()
        assert n <= SK.DD_MAX_BUCKETS, n
        got = {r["q"]: r["value"] for r in SK.dd_quantiles(
            collapsed, ["g"], [0.05, 0.9, 0.99]).collect()}
        svals = np.sort(vals)
        for q in (0.9, 0.99):  # above the collapsed mass: full guarantee
            true = svals[int(np.ceil(q * len(svals))) - 1]
            assert abs(got[q] - true) / true <= SK.DD_ALPHA + 1e-9
        # inside the collapsed mass: floor at the boundary, never below
        true_p05 = svals[int(np.ceil(0.05 * len(svals))) - 1]
        assert got[0.05] >= true_p05
        spark.catalog.clearCache()

    def test_collapse_is_a_noop_under_the_ceiling(self, spark):
        from pyspark.sql import functions as F

        df = spark.range(10_000).select(
            (F.col("id") % 997 + 1).cast("double").alias("v"),
            F.lit(1).alias("g"),
        )
        parts = SK.dd_partials(df, "v", ["g"])
        key = lambda rows: sorted(
            (r["sign"], r["bkt"], r["cnt"]) for r in rows)
        assert key(SK.dd_collapse(parts, ["g"]).collect()) == \
            key(parts.collect())
        spark.catalog.clearCache()

    def test_merge_collapses_and_stays_mergeable(self, spark):
        """Folding two over-ceiling sketches through dd_merge keeps the
        bound and total counts exact (collapse moves counts, never drops
        them)."""
        import numpy as np
        from pyspark.sql import functions as F

        exps = np.linspace(-130, 130, 8_000)
        a_vals = np.power(10.0, exps)
        b_vals = np.power(10.0, exps + 0.3)
        mk = lambda vs: spark.createDataFrame(
            [(float(v),) for v in vs], "v double"
        ).withColumn("g", F.lit(1))
        merged = SK.dd_merge(
            SK.dd_partials(mk(a_vals), "v", ["g"]),
            SK.dd_partials(mk(b_vals), "v", ["g"]),
            ["g"],
        )
        assert merged.count() <= SK.DD_MAX_BUCKETS
        total = merged.agg(F.sum("cnt")).collect()[0][0]
        spark.catalog.clearCache()
        assert total == 16_000


class TestPerplexityMonitor:
    """streaming_perplexity (St18): maintained per-language LM state —
    stream state == exact batch fold, txn-gated replay safety, and the
    read-side scores EQUAL the batch query (exact counts, not a sketch)."""

    def _batches(self, spark, n=4):
        from pyspark.sql import functions as F

        d = spark.read.parquet(SF_DIR + "/documents.parquet").select(
            "doc_id", "lang", "text"
        )
        return d, [d.filter(F.pmod("doc_id", F.lit(n)) == i) for i in range(n)]

    def _fold(self, spark, batches):
        from imagingdb_spark.operators.lm import (
            lang_term_counts,
            lm_merge_state,
        )

        state = None
        for b in batches:
            p = lang_term_counts(b)
            state = p if state is None else lm_merge_state(state, p)
            state = state.localCheckpoint(eager=True)
        return state

    def test_stream_state_matches_batch_fold_and_replays_clean(
        self, spark, tmp_path
    ):
        import glob
        import os
        import shutil
        import time

        from imagingdb_spark import snapshots as S
        from imagingdb_spark.streaming import jobs

        d, batches = self._batches(spark)
        src = str(tmp_path / "src")
        os.makedirs(src)
        for i, b in enumerate(batches):
            tmp = str(tmp_path / f"stage{i}")
            b.coalesce(1).write.parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(src, f"b{i}.parquet")
            shutil.copyfile(part, dst)
            t = time.time() + i * 10
            os.utime(dst, (t, t))

        table = str(tmp_path / "lm_state")

        def run(ck):
            stream = (
                spark.readStream.schema("doc_id long, lang string, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = jobs.streaming_perplexity(stream, table, str(tmp_path / ck))
            q.processAllAvailable()
            q.stop()

        run("ck1")
        key = lambda rows: sorted((r["lang"], r["tok"], r["c"]) for r in rows)
        want = key(self._fold(spark, batches).collect())
        assert key(S.snapshot_read(spark, table).collect()) == want

        run("ck2")  # fresh checkpoint: every batch re-fires; the txn
        #             marker screens each fold (sums would double-count)
        assert key(S.snapshot_read(spark, table).collect()) == want

        # read side: scores under the maintained LM == the batch query's
        # avg_logprob (the state IS the full-corpus LM after all batches)
        from imagingdb_spark.operators.lm import x_perplexity_bucket

        got = {
            r["doc_id"]: (r["lang"], r["avg_logprob"])
            for r in jobs.perplexity_scores(spark, table, d).collect()
        }
        want_scores = {
            r["doc_id"]: (r["lang"], r["avg_logprob"])
            for r in x_perplexity_bucket(spark, SF_DIR).collect()
        }
        spark.catalog.clearCache()
        assert got == want_scores

    def test_registered_twin_equals_batch_scores(self, spark):
        """st_perplexity (the 4-batch fold twin) must produce exactly the
        batch query's scores — integer sums are fold-order-invariant."""
        from imagingdb_spark.operators.lm import (
            st_perplexity,
            x_perplexity_bucket,
        )

        a = {
            r["doc_id"]: (r["lang"], r["avg_logprob"])
            for r in st_perplexity(spark, SF_DIR).collect()
        }
        b = {
            r["doc_id"]: (r["lang"], r["avg_logprob"])
            for r in x_perplexity_bucket(spark, SF_DIR).collect()
        }
        spark.catalog.clearCache()
        assert a == b and len(a) > 0

    def test_scores_unseen_tokens_skipped(self, spark):
        """Scoring docs against a PARTIAL LM: out-of-vocabulary tokens are
        skipped, a fully-unseen doc drops — the monitor scores against
        what the stream has learned."""
        from imagingdb_spark.operators.lm import lang_term_counts, lm_score

        seen = spark.createDataFrame(
            [(1, "en", "alpha beta alpha")], "doc_id long, lang string, text string"
        )
        state = lang_term_counts(seen)
        probe = spark.createDataFrame(
            [(2, "en", "alpha zzz"), (3, "en", "zzz www")],
            "doc_id long, lang string, text string",
        )
        got = {r["doc_id"]: r["avg_logprob"] for r in lm_score(probe, state).collect()}
        import math

        assert set(got) == {2}  # doc 3 fully unseen: dropped
        assert abs(got[2] - round(math.log(2 / 3), 4)) < 1e-9
