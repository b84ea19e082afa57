"""LM-scoring (lm.py) and MERGE-upsert (merge.py) semantics on planted
data: logprob scores must rank a gibberish-outlier document below normal
prose, TF-IDF must surface a document's distinctive term, and merge must
implement exact SCD-1 update/insert/keep semantics idempotently."""

import math

import pytest
from pyspark.sql import functions as F

from imagingdb_spark.operators.merge import merge_upsert


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the cat sat of the mat and the dog sat to the cat"),
        (1, "the dog ran in the park and the cat ran to the dog"),
        # singleton gibberish (plus one 'the' so idf('the') stays 0 corpus-wide)
        (2, "zyx qwv plugh xyzzy grault corge waldo fred plover the bletch"),
        (3, "spark engines shuffle data in the park and the mat"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _scores(spark, corpus, monkeypatch):
    """Run x_unigram_logprob against the planted corpus by patching the
    table loader (the registered query reads parquet via catalog.table)."""
    from imagingdb_spark.operators import lm

    monkeypatch.setattr(lm, "table", lambda s, d, n: corpus)
    return {
        r["doc_id"]: r["avg_logprob"]
        for r in lm.x_unigram_logprob(spark, "unused").collect()
    }


class TestUnigramLogprob:
    def test_outlier_ranks_lowest(self, spark, corpus, monkeypatch):
        """Doc 2 is made of corpus-rare tokens → lowest mean logprob."""
        scores = _scores(spark, corpus, monkeypatch)
        assert set(scores) == {0, 1, 2, 3}
        assert min(scores, key=scores.get) == 2
        assert all(v < 0 for v in scores.values())

    def test_uniform_doc_exact_value(self, spark, monkeypatch):
        """Single-doc corpus 'a a b': P(a)=2/3, P(b)=1/3 →
        mean logprob = (2·ln(2/3) + ln(1/3)) / 3."""
        from imagingdb_spark.operators import lm

        one = spark.createDataFrame([(7, "a a b")], "doc_id long, text string")
        monkeypatch.setattr(lm, "table", lambda s, d, n: one)
        [row] = lm.x_unigram_logprob(spark, "unused").collect()
        want = (2 * math.log(2 / 3) + math.log(1 / 3)) / 3
        assert row["n_tokens"] == 3
        assert row["avg_logprob"] == pytest.approx(round(want, 4), abs=1e-9)


class TestTfidf:
    def test_distinctive_term_tops(self, spark, corpus, monkeypatch):
        """'shuffle' appears only in doc 3 → it must be among doc 3's
        top terms, and stopword-ish 'the' (df=4, idf=0) must never rank."""
        from imagingdb_spark.operators import lm

        monkeypatch.setattr(lm, "table", lambda s, d, n: corpus)
        out = lm.x_tfidf(spark, "unused").collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert all(len(v) <= lm.TFIDF_TOP_K for v in by_doc.values())
        doc3_terms = {r["tok"] for r in by_doc[3]}
        assert doc3_terms & {"spark", "engines", "shuffle", "data"}
        assert all(r["tok"] != "the" for r in out)
        for rows in by_doc.values():
            ranks = sorted(r["rk"] for r in rows)
            assert ranks == list(range(1, len(rows) + 1))


class TestMergeUpsert:
    def _frames(self, spark):
        t = spark.createDataFrame(
            [(1, "one"), (2, "two"), (3, "three")], "k long, v string"
        )
        s = spark.createDataFrame(
            [(2, "TWO"), (9, "nine")], "k long, v string"
        )
        return t, s

    def test_actions(self, spark):
        t, s = self._frames(spark)
        got = {r["k"]: (r["v"], r["action"]) for r in merge_upsert(t, s, "k").collect()}
        assert got == {
            1: ("one", "keep"),
            2: ("TWO", "update"),
            3: ("three", "keep"),
            9: ("nine", "insert"),
        }

    def test_idempotent(self, spark):
        """Merging the same source twice yields the same corpus state."""
        t, s = self._frames(spark)
        once = merge_upsert(t, s, "k").drop("action")
        twice = merge_upsert(once, s, "k").drop("action")
        assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))

    def test_schema_mismatch_rejected(self, spark):
        t, _ = self._frames(spark)
        bad = spark.createDataFrame([(1, "x", 0)], "k long, v string, extra int")
        with pytest.raises(ValueError, match="schemas must match"):
            merge_upsert(t, bad, "k")


class TestScd2:
    def _hist(self, spark):
        from imagingdb_spark.operators.merge import merge_scd2

        hist = spark.createDataFrame(
            [(1, "en", "2024-01-01 00:00:00", None),
             (2, "de", "2024-01-01 00:00:00", None)],
            "k long, lang string, valid_from string, valid_to string",
        ).selectExpr(
            "k", "lang",
            "cast(valid_from as timestamp) valid_from",
            "cast(valid_to as timestamp) valid_to",
        )
        chg = spark.createDataFrame(
            [(1, "fr", "2024-02-01 00:00:00"),   # real change
             (2, "de", "2024-02-01 00:00:00"),   # no-op redelivery
             (3, "zh", "2024-02-01 00:00:00")],  # brand-new key
            "k long, lang string, change_ts string",
        ).selectExpr("k", "lang", "cast(change_ts as timestamp) change_ts")
        return merge_scd2, hist, chg

    def test_close_noop_insert(self, spark):
        merge_scd2, hist, chg = self._hist(spark)
        out = merge_scd2(hist, chg, key="k")
        rows = {(r["k"], r["lang"]): r for r in out.collect()}
        assert len(rows) == 4
        assert rows[(1, "en")]["valid_to"] is not None      # closed
        assert rows[(1, "fr")]["valid_to"] is None          # new current
        assert rows[(2, "de")]["valid_to"] is None          # no-op kept open
        assert rows[(3, "zh")]["valid_to"] is None          # first interval

    def test_redelivery_is_idempotent(self, spark):
        """Applying the SAME batch twice must not fragment intervals —
        the second pass sees every change row equal to the now-current
        attributes and does nothing."""
        merge_scd2, hist, chg = self._hist(spark)
        once = merge_scd2(hist, chg, key="k")
        twice = merge_scd2(once, chg, key="k")
        a = sorted(map(tuple, once.collect()))
        b = sorted(map(tuple, twice.collect()))
        assert a == b
