"""Gopher quality-rule bundle (Rae et al. 2021 Appendix A) on crafted
documents that trip each rule individually — the synthetic corpus has no
newlines/bullets/symbols, so the gate query can't exercise those arms."""

import pytest
from pyspark.sql import functions as F

from vldt_spark.functions.text import gopher_rules, gopher_report

GOOD = (
    "the farmers have gathered near the river to discuss how the harvest "
    "will be shared among the families and that every field gets water "
    "with fair rotation during the long dry months of the summer season"
)


@pytest.fixture(scope="module")
def flags(spark):
    rows = [
        ("good", GOOD),
        ("short", "too few words here"),  # word_count
        ("longwords", " ".join(["extraordinarily"] * 40)),  # mean_word_len + stopwords
        ("symbols", "the be to of and " + "# " * 30),  # symbol_ratio (+alpha)
        ("bullets", "\n".join(["- item one here"] * 10) + "\nthe be to of and that have with plenty "
                    + "more regular words " * 5),  # bullet lines > 90%
        ("ellipses", "\n".join(["this line trails off..."] * 10)
                     + "\nthe be to of and that have with normal closing words "
                     + "again and again " * 5),  # ellipsis lines > 30%
        ("numeric", "the be to of and " + "12345 " * 40),  # alpha_words
        ("nostop", " ".join(f"zq{i}" for i in range(60))),  # stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    g = gopher_rules(F.col("text"), min_words=20)
    out = df.select("doc_id", g.alias("g")).collect()
    return {r["doc_id"]: r["g"].asDict() for r in out}


def test_good_doc_passes_all(flags):
    assert all(flags["good"].values())


@pytest.mark.parametrize(
    "doc,rule",
    [
        ("short", "word_count_ok"),
        ("longwords", "mean_word_len_ok"),
        ("symbols", "symbol_ratio_ok"),
        ("bullets", "bullet_lines_ok"),
        ("ellipses", "ellipsis_lines_ok"),
        ("numeric", "alpha_words_ok"),
        ("nostop", "stopwords_ok"),
    ],
)
def test_each_rule_trips_on_its_crafted_doc(flags, doc, rule):
    assert flags[doc][rule] is False
    assert flags[doc]["passes"] is False


def test_report_fractions(spark):
    df = spark.createDataFrame(
        [("a", GOOD), ("b", GOOD), ("c", "too short")],
        "doc_id string, text string",
    )
    row = gopher_report(df, min_words=20).collect()[0]
    assert row["n_docs"] == 3
    assert row["word_count_fail_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert row["pass_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["symbol_ratio_fail_frac"] == 0.0


def test_suite_quality_guards_arms(spark):
    from vldt_spark.checks.suite import Suite, expect

    df = spark.createDataFrame(
        [("a", GOOD), ("b", GOOD), ("c", "too short")],
        "doc_id string, text string",
    )
    rows = Suite(
        [
            expect.gopher_pass_frac_above("text", 0.5, min_words=20),  # 2/3 > 0.5
            expect.gopher_pass_frac_above("text", 0.9, min_words=20),  # 2/3 < 0.9
            expect.fertility_between("text", 0.5, 2.0),
            expect.fertility_between("text", 0.0, 0.1),
        ]
    ).run(df).collect()
    got = [(r["check"], r["threshold"], r["passed"]) for r in rows]
    assert ("gopher_pass_frac_above", 0.5, True) in got
    assert ("gopher_pass_frac_above", 0.9, False) in got
    assert ("fertility_between", 2.0, True) in got
    assert ("fertility_between", 0.1, False) in got
    gm = [r["metric"] for r in rows if r["check"] == "gopher_pass_frac_above"][0]
    assert gm == pytest.approx(2 / 3, abs=1e-6)


def test_suite_quality_guards_empty_corpus(spark):
    from vldt_spark.checks.suite import Suite, expect

    df = spark.createDataFrame([], "doc_id string, text string")
    rows = Suite(
        [
            expect.gopher_pass_frac_above("text", 0.5),
            expect.fertility_between("text", 0.5, 2.0),
        ]
    ).run(df).collect()
    assert all(r["passed"] is False for r in rows)  # undefined metric = fail loud
