"""Round-5 final additions: PII redaction, perplexity-band pruning,
cross-source duplicate matrix, and the dataset-card report."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


# -- pii_redact ---------------------------------------------------------------


def test_pii_redact_replaces_and_counts(spark):
    from vldt_spark.functions.text import pii_redact

    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@exa-mple.org or x@y.io thanks"),
            (2, "server 10.0.0.1 and 192.168.1.255 up"),
            (3, "call 555-123-4567 or 555.123.4567 today"),
            (4, "clean text with no pii at all"),
            (5, ""),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert out[1]["n_email"] == 2 and out[1]["n_ip"] == 0
    assert out[1]["text"] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert out[2]["n_ip"] == 2
    assert out[2]["text"] == "server <IP> and <IP> up"
    assert out[3]["n_phone"] == 2
    assert out[3]["text"] == "call <PHONE> or <PHONE> today"
    assert out[4]["text"] == "clean text with no pii at all"
    assert (out[4]["n_email"], out[4]["n_ip"], out[4]["n_phone"]) == (0, 0, 0)
    assert out[5]["text"] == ""


def test_pii_redact_counts_are_pre_redaction(spark):
    """Counts are measured on the ORIGINAL text: an email whose domain
    looks IP-ish is counted once as email; the ip count reflects the raw
    text, not the post-email-redaction remainder."""
    from vldt_spark.functions.text import pii_redact

    df = spark.createDataFrame(
        [(1, "ping admin@10.0.0.1 now")], "doc_id int, text string"
    )
    r = pii_redact(df).collect()[0]
    # the email pattern eats 'admin@10.0.0.1' (domain '10.0.0.1' matches
    # [A-Za-z0-9.-]+\.[A-Za-z]{2,}? no — needs alpha TLD, so NOT an email);
    # the ip pattern fires on the raw text.
    assert r["n_ip"] == 1
    assert "<IP>" in r["text"]


def test_pii_redact_report_char_delta(spark):
    from vldt_spark.functions.text import pii_redact_report

    df = spark.createDataFrame(
        [
            ("s1", "a@b.co here"),          # 6 chars -> <EMAIL> (7): -1
            ("s1", "ip 10.0.0.1"),          # 8 chars -> <IP> (4): +4
            ("s2", "no pii"),
        ],
        "source string, text string",
    )
    rows = {r["source"]: r for r in pii_redact_report(df, by="source").collect()}
    assert rows["s1"]["n_docs_redacted"] == 2
    assert rows["s1"]["n_email"] == 1 and rows["s1"]["n_ip"] == 1
    assert rows["s1"]["chars_removed"] == (6 - 7) + (8 - 4)
    assert rows["s2"]["n_docs_redacted"] == 0
    assert rows["s2"]["chars_removed"] == 0


# -- ppl_band_filter ----------------------------------------------------------


def _char_tokens(docs):
    return docs.select(
        "doc_id",
        "source",
        F.transform(F.split(F.col("text"), ""), lambda c: F.ascii(c)).alias(
            "tokens"
        ),
    )


def test_ppl_band_filter_exact_bounds_and_determinism(spark, docs):
    from vldt_spark.functions.lm import ppl_band_filter

    ct = _char_tokens(docs)
    out = ppl_band_filter(ct, 256, lo=0.2, hi=0.8, by="source")
    rows = out.select("source", "ppl", "pct_rank").collect()
    assert rows, "band filter kept nothing"
    assert all(0.2 <= r["pct_rank"] <= 0.8 for r in rows)
    # deterministic: same plan twice -> same kept id set
    ids1 = {r["doc_id"] for r in out.select("doc_id").collect()}
    ids2 = {
        r["doc_id"]
        for r in ppl_band_filter(ct, 256, lo=0.2, hi=0.8, by="source")
        .select("doc_id")
        .collect()
    }
    assert ids1 == ids2
    # per-group band: every group keeps strictly fewer rows than it has
    per = (
        out.groupBy("source").count().withColumnRenamed("count", "kept")
        .join(docs.groupBy("source").count(), "source")
        .collect()
    )
    assert all(0 < r["kept"] < r["count"] for r in per)


def test_ppl_band_filter_approx_matches_exact_loosely(spark, docs):
    """The approx path is the 100 TB strategy — it must agree with the
    exact band up to boundary rows (same thresholds, epsilon-different
    cut points)."""
    from vldt_spark.functions.lm import ppl_band_filter

    ct = _char_tokens(docs)
    exact = {
        r["doc_id"]
        for r in ppl_band_filter(ct, 256, lo=0.1, hi=0.9, by="source")
        .select("doc_id")
        .collect()
    }
    approx = {
        r["doc_id"]
        for r in ppl_band_filter(ct, 256, lo=0.1, hi=0.9, by="source", exact=False)
        .select("doc_id")
        .collect()
    }
    # symmetric difference bounded by a few rows per group boundary
    n_groups = docs.select("source").distinct().count()
    assert len(exact ^ approx) <= 4 * n_groups
    assert len(exact & approx) > 0.8 * len(exact)


def test_ppl_band_filter_drops_unscored(spark):
    from vldt_spark.functions.lm import ppl_band_filter

    df = spark.createDataFrame(
        [(1, "a", [65, 66, 67]), (2, "a", []), (3, "a", None),
         (4, "a", [65, 65, 65]), (5, "a", [90, 1, 7])],
        "doc_id long, source string, tokens array<int>",
    )
    out = ppl_band_filter(df, 256, lo=0.0, hi=1.0, by="source")
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1, 4, 5}  # empty/NULL sequences carry no score


# -- dup_source_matrix --------------------------------------------------------


def test_dup_source_matrix_pair_math(spark):
    from vldt_spark.functions.dedup import dup_source_matrix

    df = spark.createDataFrame(
        [
            # "x" appears 2x in s1, 1x in s2 -> s1/s1: C(2,2)=1, s1/s2: 2
            (1, "s1", "x"), (2, "s1", "x"), (3, "s2", "x"),
            # "y" appears once each in s2, s3 -> s2/s3: 1
            (4, "s2", "y"), (5, "s3", "y"),
            # unique text: contributes nothing
            (6, "s3", "z"),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        (r["source_a"], r["source_b"]): (r["n_shared_texts"], r["n_doc_pairs"])
        for r in dup_source_matrix(df).collect()
    }
    assert out == {
        ("s1", "s1"): (1, 1),
        ("s1", "s2"): (1, 2),
        ("s2", "s3"): (1, 1),
    }


def test_dup_source_matrix_normalizes_text(spark):
    """The matrix keys on the engine-wide fingerprint (whitespace
    normalized, lowercased) — ' Foo  Bar ' and 'foo bar' collide."""
    from vldt_spark.functions.dedup import dup_source_matrix

    df = spark.createDataFrame(
        [(1, "a", " Foo  Bar "), (2, "b", "foo bar")],
        "doc_id long, source string, text string",
    )
    out = dup_source_matrix(df).collect()
    assert len(out) == 1
    assert (out[0]["source_a"], out[0]["source_b"]) == ("a", "b")
    assert out[0]["n_doc_pairs"] == 1


# -- corpus_card --------------------------------------------------------------


def test_corpus_card_values_against_duckdb(spark, docs):
    import duckdb

    from vldt_spark.functions.corpus import corpus_card

    got = {r["metric"]: r["value"] for r in corpus_card(docs).collect()}
    con = duckdb.connect()
    n, chars, srcs, langs, dtext, empty = con.sql(
        f"""SELECT count(*), sum(length(text)), count(DISTINCT source),
                   count(DISTINCT lang), count(DISTINCT md5(text)),
                   avg(CASE WHEN length(trim(text)) = 0 THEN 1.0 ELSE 0.0 END)
            FROM '{SF_DIR}/documents.parquet'"""
    ).fetchone()
    assert got["n_docs"] == float(n)
    assert got["n_chars"] == float(chars)
    assert got["n_sources"] == float(srcs)
    assert got["n_langs"] == float(langs)
    assert got["distinct_text_frac"] == pytest.approx(dtext / n, abs=1e-6)
    assert got["empty_frac"] == pytest.approx(empty, abs=1e-6)
    assert abs(got["mean_chars"] - chars / n) < 1e-3
    assert 0.0 <= got["top_source_share"] <= 1.0
    assert 0.0 <= got["source_entropy"] <= math.log(srcs) + 1e-9
    assert 0.0 <= got["pii_frac"] <= 1.0
    assert 0.0 <= got["quality_pass_frac"] <= 1.0


def test_corpus_card_entropy_closed_form(spark):
    from vldt_spark.functions.corpus import corpus_card

    # 3 sources with counts 2/1/1: H = ln4 - (2ln2)/4 = 1.5 ln2... compute
    df = spark.createDataFrame(
        [(1, "a", "t1", "en"), (2, "a", "t2", "en"),
         (3, "b", "t3", "en"), (4, "c", "t4", "en")],
        "doc_id long, source string, text string, lang string",
    )
    got = {r["metric"]: r["value"] for r in corpus_card(df).collect()}
    expected = math.log(4) - (2 * math.log(2)) / 4
    assert got["source_entropy"] == pytest.approx(expected, abs=1e-6)
    assert got["top_source_share"] == 0.5


def test_corpus_card_approx_mode_runs(spark, docs):
    from vldt_spark.functions.corpus import corpus_card

    got = {r["metric"]: r["value"] for r in corpus_card(docs, approx=True).collect()}
    # HLL estimates land within its documented rsd of the exact values
    assert abs(got["n_sources"] - 20) <= 2
    assert got["n_docs"] == float(docs.count())


# -- suite guards: pii_frac_below / distinct_text_frac_above -------------------


def test_suite_pii_frac_guard_arms(spark):
    from vldt_spark.checks.suite import Suite, expect

    df = spark.createDataFrame(
        [(1, "mail a@b.co"), (2, "clean"), (3, "clean"), (4, "clean")],
        "doc_id long, text string",
    )
    rep = {
        r["threshold"]: r
        for r in Suite(
            [
                expect.pii_frac_below("text", 0.5),   # 0.25 < 0.5 -> pass
                expect.pii_frac_below("text", 0.25),  # 0.25 !< 0.25 -> fail
            ]
        )
        .run(df)
        .collect()
    }
    assert rep[0.5]["passed"] and rep[0.5]["metric"] == 0.25
    assert not rep[0.25]["passed"]


def test_suite_pii_frac_guard_empty_fails_loud(spark):
    import math

    from vldt_spark.checks.suite import Suite, expect

    empty = spark.createDataFrame([], "doc_id long, text string")
    row = Suite([expect.pii_frac_below("text", 0.5)]).run(empty).collect()[0]
    assert not row["passed"] and math.isnan(row["metric"])


def test_suite_distinct_text_frac_guard_arms(spark):
    from vldt_spark.checks.suite import Suite, expect

    # ' X ' and 'x' share a fingerprint -> 3 distinct / 4 rows = 0.75
    df = spark.createDataFrame(
        [(1, " X "), (2, "x"), (3, "y"), (4, "z")],
        "doc_id long, text string",
    )
    rep = {
        r["threshold"]: r
        for r in Suite(
            [
                expect.distinct_text_frac_above("text", 0.5),   # pass
                expect.distinct_text_frac_above("text", 0.75),  # !> -> fail
            ]
        )
        .run(df)
        .collect()
    }
    assert rep[0.5]["passed"] and rep[0.5]["metric"] == 0.75
    assert not rep[0.75]["passed"]


def test_suite_distinct_text_frac_approx_mode(spark, docs):
    from vldt_spark.checks.suite import Suite, expect

    row = (
        Suite([expect.distinct_text_frac_above("text", 0.9, approx=True)])
        .run(docs)
        .collect()[0]
    )
    # raw corpus has no exact dups; HLL stays within its rsd of 1.0
    assert row["passed"] and row["metric"] > 0.9


# -- jobs/corpus_card.py -------------------------------------------------------


def test_corpus_card_job_exit_codes(spark, tmp_path):
    """CI contract: exit 0 when the gates pass, 1 when one fails; the
    card and gate report land as parquet either way."""
    import sys

    sys.path.insert(0, "/root/repo")
    from jobs.corpus_card import main as card_main

    src = f"{SF_DIR}/documents.parquet"
    out = str(tmp_path / "card_ok")
    rc = card_main(
        ["--input", src, "--output", out,
         "--max-pii-frac", "0.01", "--min-distinct-frac", "0.99"]
    )
    assert rc == 0
    card = {
        r["metric"]: r["value"]
        for r in spark.read.parquet(out + "/card").collect()
    }
    assert card["distinct_text_frac"] == 1.0
    gates = spark.read.parquet(out + "/gates").collect()
    assert len(gates) == 2 and all(r["passed"] for r in gates)

    # an unsatisfiable dup-health floor fails the job
    out2 = str(tmp_path / "card_bad")
    rc2 = card_main(
        ["--input", src, "--output", out2, "--min-distinct-frac", "1.5"]
    )
    assert rc2 == 1
    bad = spark.read.parquet(out2 + "/gates").collect()
    assert len(bad) == 1 and not bad[0]["passed"]
