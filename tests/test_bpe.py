"""BPE tokenizer: learn_bpe vs an independent naive reference trainer,
encode greedy semantics, and plan shape (no corpus shuffle in encode)."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from vldt_spark.functions.bpe import _encode_one, bpe_encode, learn_bpe


def naive_learn_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Single-node reference: the textbook algorithm, written independently
    of the distributed path (explicit dicts, no Spark)."""
    seqs = [list(t) for t in texts if t]
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for s in seqs:
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += 1
        if not counts:
            break
        # max count, ties broken lexicographically (matches learn_bpe)
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_seqs = []
        for s in seqs:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new_seqs.append(out)
        seqs = new_seqs
    return merges


CORPUS = [
    "the theme of the thesis",
    "then the theory thereof",
    "there they thawed",
    "banana bandana",
    "abracadabra",
] * 3


def test_learn_matches_naive_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "txt string")
    got = learn_bpe(df, "txt", 10)
    want = naive_learn_bpe(CORPUS, 10)
    assert got == want


def test_learned_merges_compress(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "txt string")
    merges = learn_bpe(df, "txt", 12)
    enc = bpe_encode(df, "txt", merges)
    row = enc.select(
        F.sum(F.size("bpe_tokens")).alias("n_tok"),
        F.sum(F.length("txt")).alias("n_chars"),
    ).first()
    assert row["n_tok"] < row["n_chars"] * 0.8  # real compression happened


def test_encode_greedy_priority_order():
    # rank order matters: with (a,b) ranked above (b,c), "abc" -> [ab, c]
    assert _encode_one(list("abc"), {("a", "b"): 0, ("b", "c"): 1}) == ["ab", "c"]
    # and reversed ranks give the other segmentation
    assert _encode_one(list("abc"), {("a", "b"): 1, ("b", "c"): 0}) == ["a", "bc"]
    # cascaded merges reach multi-char tokens
    ranks = {("a", "b"): 0, ("ab", "ab"): 1}
    assert _encode_one(list("abab"), ranks) == ["abab"]


def test_encode_handles_nulls_and_empties(spark):
    df = spark.createDataFrame([(1, "ab"), (2, None), (3, "")], "i int, txt string")
    rows = {r["i"]: r["bpe_tokens"] for r in bpe_encode(df, "txt", [("a", "b")]).collect()}
    assert rows[1] == ["ab"] and rows[2] == [] and rows[3] == []


def test_encode_plan_has_no_shuffle(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "txt string")
    plan = (
        bpe_encode(df, "txt", [("t", "h"), ("th", "e")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_sampled_training_still_learns(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS * 10], "txt string")
    merges = learn_bpe(df, "txt", 4, sample_fraction=0.5, checkpoint_every=2)
    assert len(merges) == 4
    assert merges[0][0] != merges[0][1] or merges[0][0]  # well-formed pairs


def test_bpe_ids_roundtrip_property(spark):
    """decode(encode_ids(text)) == text for arbitrary real text with a
    learned merge table — the lossless-BPE property at id level."""
    from vldt_spark.functions.bpe import bpe_decode_ids, bpe_encode_ids, bpe_vocab

    df = spark.createDataFrame([(t,) for t in CORPUS], "txt string")
    merges = learn_bpe(df, "txt", 8)
    alphabet = sorted({c for t in CORPUS for c in t})
    vocab = bpe_vocab(merges, alphabet)
    enc = bpe_encode_ids(df, "txt", merges, vocab)
    dec = bpe_decode_ids(enc, "tokens", vocab)
    assert dec.where(F.col("text_decoded") != F.col("txt")).count() == 0
    # ids are dense and in-vocab
    row = dec.select(F.min(F.array_min("tokens")).alias("lo"),
                     F.max(F.array_max("tokens")).alias("hi")).first()
    assert row["lo"] >= 0 and row["hi"] < len(vocab)


def test_bpe_encode_ids_unk(spark):
    from vldt_spark.functions.bpe import bpe_encode_ids, bpe_vocab

    vocab = bpe_vocab([("a", "b")], ["a", "b"])
    df = spark.createDataFrame([("abz",)], "txt string")
    row = bpe_encode_ids(df, "txt", [("a", "b")], vocab).first()
    assert row["tokens"] == [2, -1]  # "ab" merged, "z" -> unk_id
