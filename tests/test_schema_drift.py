"""Schema-evolution drift: added/dropped/retyped/nullability detection,
metadata-only cost, and the null-rate-shift enrichment."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from vldt_spark.checks.schema_drift import schema_diff, schema_drift_report


def test_detects_all_change_kinds(spark):
    old = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("name", T.StringType(), True),
                T.StructField("age", T.LongType(), True),
            ]
        ),
    )
    new = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("id", T.LongType(), True),  # nullability flip
                T.StructField("age", T.IntegerType(), True),  # retyped
                T.StructField("email", T.StringType(), True),  # added
                # name dropped
            ]
        ),
    )
    rows = {(r["column"], r["change"]): r for r in schema_diff(old, new).collect()}
    assert rows[("email", "added")]["new_type"] == "string"
    assert rows[("name", "dropped")]["old_type"] == "string"
    assert rows[("age", "retyped")]["old_type"] == "bigint"
    assert rows[("age", "retyped")]["new_type"] == "int"
    assert rows[("id", "nullability")]["old_type"] == "required"
    assert rows[("id", "nullability")]["new_type"] == "nullable"
    assert len(rows) == 4


def test_identical_schemas_empty(spark):
    df = spark.range(3)
    assert schema_diff(df, df).count() == 0


def test_case_insensitive_matching(spark):
    old = spark.createDataFrame([], "DocID long, text string")
    new = spark.createDataFrame([], "docid long, text string")
    assert schema_diff(old, new).count() == 0


def test_diff_is_metadata_only(spark):
    # no job may run: diffing two frames built on a throwing UDF source
    # must still succeed because nothing is ever executed
    old = spark.range(10).select(
        F.col("id"), (F.col("id") / F.lit(0)).alias("boom")
    )
    new = old.drop("boom")
    rows = schema_diff(old, new).collect()
    assert [(r["column"], r["change"]) for r in rows] == [("boom", "dropped")]


def test_null_rate_shift(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c"), (4, "d")], "i int, v string")
    new = spark.createDataFrame([(1, "a"), (2, None), (3, None), (4, "d")], "i int, v string")
    rows = {
        (r["column"], r["change"]): r
        for r in schema_drift_report(old, new, with_null_rates=True).collect()
    }
    r = rows[("v", "null_rate_shift")]
    assert r["old_type"] == "0.000000" and r["new_type"] == "0.500000"
    assert ("i", "null_rate_shift") not in rows  # unchanged rate not reported


# ------------------------------------------------------------ snapshot


def _versions(spark):
    before = spark.createDataFrame(
        [
            (1, "alpha", 10),
            (2, "beta", 20),
            (3, "gamma", 30),
            (4, None, 40),
            (5, "eps", None),
        ],
        "doc_id int, text string, n int",
    )
    after = spark.createDataFrame(
        [
            (1, "alpha", 10),       # unchanged
            (2, "BETA", 20),        # text changed
            (3, "gamma", 99),       # n changed
            (4, None, 41),          # n changed (null text stays equal)
            (6, "new", 60),         # added; 5 removed
        ],
        "doc_id int, text string, n int",
    )
    return before, after


def test_snapshot_diff_statuses_and_lineage(spark):
    from vldt_spark.checks.snapshot import snapshot_diff

    before, after = _versions(spark)
    got = {
        r["doc_id"]: (r["status"], r["changed_cols"])
        for r in snapshot_diff(before, after).collect()
    }
    assert got[1] == ("unchanged", "")
    assert got[2] == ("changed", "text")
    assert got[3] == ("changed", "n")
    assert got[4] == ("changed", "n")      # NULL == NULL on text
    assert got[5] == ("removed", "")
    assert got[6] == ("added", "")
    assert len(got) == 6


def test_snapshot_diff_multi_col_change_sorted(spark):
    from pyspark.sql import functions as F

    from vldt_spark.checks.snapshot import snapshot_diff

    before, _ = _versions(spark)
    after = before.withColumn("text", F.upper("text")).withColumn(
        "n", F.col("n") + 1
    )
    got = {
        r["doc_id"]: (r["status"], r["changed_cols"])
        for r in snapshot_diff(before, after).collect()
    }
    # doc 1: both differ, names sorted; doc 4: text NULL->NULL equal
    assert got[1] == ("changed", "n,text")
    assert got[4] == ("changed", "n")
    # doc 5: n NULL on both sides stays equal, text eps->EPS
    assert got[5] == ("changed", "text")


def test_snapshot_summary_and_compare_cols_subset(spark):
    from vldt_spark.checks.snapshot import snapshot_summary

    before, after = _versions(spark)
    s = {
        r["status"]: r["n_rows"]
        for r in snapshot_summary(before, after).collect()
    }
    assert s == {"unchanged": 1, "changed": 3, "removed": 1, "added": 1}
    # restricting compare_cols to text: docs 3/4 become unchanged
    s2 = {
        r["status"]: r["n_rows"]
        for r in snapshot_summary(before, after, compare_cols=["text"]).collect()
    }
    assert s2 == {"unchanged": 3, "changed": 1, "removed": 1, "added": 1}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="absent"):
        snapshot_summary(before, after, compare_cols=["nope"])


def test_suite_snapshot_churn_guard(spark):
    from vldt_spark.checks.suite import Suite, expect

    before, after = _versions(spark)
    # diff population: 6 ids, 1 unchanged -> churn 5/6
    rep = {
        r["threshold"]: (r["metric"], r["passed"])
        for r in Suite(
            [
                expect.snapshot_churn_below(before, 0.9),
                expect.snapshot_churn_below(before, 0.5),
            ]
        ).run(after).collect()
    }
    # suite reports round half-up to 6 decimals
    assert abs(rep[0.9][0] - 5.0 / 6.0) < 1e-6 and rep[0.9][1] is True
    assert abs(rep[0.5][0] - 5.0 / 6.0) < 1e-6 and rep[0.5][1] is False

    # identical versions: zero churn
    rep2 = Suite([expect.snapshot_churn_below(before, 0.01)]).run(before).first()
    assert rep2["metric"] == 0.0 and rep2["passed"] is True

    # both empty: NaN metric, failed
    empty = before.where("doc_id < 0")
    rep3 = Suite([expect.snapshot_churn_below(empty, 0.5)]).run(empty).first()
    assert rep3["metric"] != rep3["metric"] and rep3["passed"] is False
