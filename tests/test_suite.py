"""Check-suite runner: one fused pass for row-local expectations, bounded
jobs for whole-table ones, one report frame."""

from pyspark.sql import functions as F

from vldt_spark.checks.suite import Suite, expect


def test_suite_report_and_gate(spark):
    df = spark.createDataFrame(
        [
            (1, "a-1", 0.5, "x"),
            (2, "a-2", 1.5, "x"),   # range violation (hi=1)
            (2, "b!", None, "y"),   # dup key, regex violation, null score
            (4, "a-4", 0.0, "zz"),  # isin violation
        ],
        "id long, name string, score double, seg string",
    )
    dim = spark.createDataFrame([("x",), ("y",)], "seg string")
    suite = Suite(
        [
            expect.not_null("score", max_nulls=0),
            expect.null_rate_below("score", 0.5),
            expect.range("score", lo=0.0, hi=1.0),
            expect.regex("name", r"^[ab]-\d$"),
            expect.isin("seg", ["x", "y", "zz"]),
            expect.unique("id", max_dup_rows=0),
            expect.ref("seg", dim, "seg", max_violations=1),
        ]
    )
    rep = {(r["check"], r["column"]): r for r in suite.run(df).collect()}
    assert rep[("not_null", "score")]["metric"] == 1.0
    assert rep[("not_null", "score")]["passed"] is False
    assert rep[("null_rate_below", "score")]["metric"] == 0.25
    assert rep[("null_rate_below", "score")]["passed"] is True
    assert rep[("range", "score")]["metric"] == 1.0  # only the 1.5
    assert rep[("regex", "name")]["metric"] == 1.0
    assert rep[("isin", "seg")]["metric"] == 0.0 and rep[("isin", "seg")]["passed"]
    assert rep[("unique", "id")]["metric"] == 2.0  # two rows share id=2
    assert rep[("unique", "id")]["passed"] is False
    # one 'zz' row violates the dim but the threshold allows 1
    assert rep[("ref", "seg")]["metric"] == 1.0
    assert rep[("ref", "seg")]["passed"] is True
    assert suite.passed(df) is False

    clean = df.where(F.col("id") == 1)
    assert Suite([expect.not_null("score"), expect.unique("id")]).passed(clean)


def test_suite_row_local_is_single_pass(spark):
    """All row-local expectations fuse into ONE aggregate over one scan."""
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    suite = Suite(
        [
            expect.not_null("id"),
            expect.range("id", lo=0),
            expect.regex("name", "^a$"),
            expect.null_rate_below("name", 0.9),
        ]
    )
    rep = suite._row_local_report(df, suite.expectations)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # one HashAggregate pair (partial+final) over one scan — the scan
    # appears once, no union of per-expectation jobs
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") == 1, plan


def test_suite_psi_expectation(spark):
    ref = spark.range(5000).select((F.col("id") % 100).cast("double").alias("v"))
    same = spark.range(5000).select((F.col("id") % 100).cast("double").alias("v"))
    shifted = spark.range(5000).select(
        ((F.col("id") % 100) + 60).cast("double").alias("v")
    )
    s = Suite([expect.psi_below("v", ref, 0.1, bins=10, lo=0.0, hi=100.0)])
    assert s.passed(same)
    rep = s.run(shifted).first()
    assert rep["passed"] is False and rep["metric"] > 0.1
