"""Tokenizer fertility report: token definition and byte/char split."""

import pytest

from vldt_spark.functions.tokens import fertility_report


def test_fertility_counts(spark):
    # "don't stop" -> words: 2; pretokens: don / ' / t / stop = 4
    # "héllo wörld" -> words: 2; pretokens: h / é(sym) / llo / w / ö / rld = 6
    #   (é, ö are non-ASCII => not [A-Za-z0-9] => standalone symbols)
    df = spark.createDataFrame(
        [(1, "don't stop", "en"), (2, "héllo wörld", "de")],
        "doc_id long, text string, lang string",
    )
    rows = {r["lang"]: r for r in fertility_report(df).collect()}
    en, de = rows["en"], rows["de"]
    assert (en["n_words"], en["n_tokens"]) == (2, 4)
    assert en["tokens_per_word"] == 2.0
    assert (de["n_words"], de["n_tokens"]) == (2, 6)
    # é and ö are 2 UTF-8 bytes but 1 char: bytes 13, chars 11
    assert de["bytes_per_token"] == pytest.approx(13 / 6, abs=1e-6)
    assert de["chars_per_word"] == pytest.approx(11 / 2, abs=1e-6)


def test_fertility_empty_group_guard(spark):
    df = spark.createDataFrame([(1, "", "xx")], "doc_id long, text string, lang string")
    r = fertility_report(df).collect()[0]
    assert (r["n_words"], r["n_tokens"]) == (0, 0)
    assert r["tokens_per_word"] == 0.0  # greatest(...,1) guards the division
