"""Expectations module: every rule kind catches its violation, clean data
passes, row-local rules share one scan, and the serial-format rule
reproduces the reference's ID validation (cli_utils.py:4-41) as a single
vectorized check."""

from __future__ import annotations

import pytest

from imagingdb_spark import expectations as X


@pytest.fixture()
def messy(spark):
    return spark.createDataFrame(
        [
            (1, "AB-2024-01-02-03-04-05-0001", "uint8", 5, 10),
            (2, "bad serial", "uint16", -1, 20),
            (3, None, "float32", 3, None),
            (3, "CD-2024-02-02-03-04-05-0002", "uint8", 700, 30),
        ],
        "id long, serial string, bit_depth string, width long, parent long",
    )


SERIAL_RX = r"^[A-Z]+-\d{4}-\d{2}-\d{2}-\d{2}-\d{2}-\d{2}-\d{4}$"


class TestRules:
    def test_each_rule_counts_its_violations(self, spark, messy):
        parent = spark.createDataFrame([(10,), (20,)], "pid long")
        got = {
            r["rule"]: r
            for r in X.check(
                messy,
                [
                    X.not_null("serial"),
                    X.matches("serial", SERIAL_RX),
                    X.accepted_values("bit_depth", ["uint8", "uint16"]),
                    X.in_range("width", lo=0, hi=600),
                    X.unique("id"),
                    X.foreign_key("parent", parent, "pid"),
                ],
            )
        }
        assert got["not_null(serial)"]["violations"] == 1
        # 'bad serial' fails the regex; NULL is not_null's job, not matches'
        assert got["matches(serial)"]["violations"] == 1
        assert got["accepted_values(bit_depth)"]["violations"] == 1
        assert got["in_range(width)"]["violations"] == 2  # -1 and 700
        # unique counts every row of the duplicated key (2 rows of id=3)
        assert got["unique(id)"]["violations"] == 2
        assert got["unique(id)"]["sample"] == [3]
        fk = got["foreign_key(parent→pid)"]
        assert fk["violations"] == 1 and fk["sample"] == [30]

    def test_clean_table_passes(self, spark):
        clean = spark.createDataFrame(
            [(1, "AB-2024-01-02-03-04-05-0001")], "id long, serial string"
        )
        X.assert_expectations(
            clean,
            [X.not_null("serial"), X.matches("serial", SERIAL_RX), X.unique("id")],
        )

    def test_assert_raises_with_report(self, spark, messy):
        with pytest.raises(AssertionError, match="not_null\\(serial\\)"):
            X.assert_expectations(messy, [X.not_null("serial")])

    def test_row_local_rules_share_one_scan(self, spark, messy):
        """The count aggregation for N row-local rules is ONE job over one
        scan — verify via the plan: a single Aggregate, no joins."""
        from imagingdb_spark.expectations import _row_violation

        import pyspark.sql.functions as F

        rules = [
            X.not_null("serial"),
            X.matches("serial", SERIAL_RX),
            X.in_range("width", lo=0),
        ]
        agg = messy.agg(
            *[
                F.sum(_row_violation(e).cast("long")).alias(f"v{i}")
                for i, e in enumerate(rules)
            ]
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        assert plan.count("Scan") == 1, plan
