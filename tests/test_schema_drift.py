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
