"""Property-based parity for the C4 cleaning bundle: the Catalyst
line-filter/document-screen projection vs a pure-Python oracle of the
published rules, over randomized multi-line documents."""

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vldt_spark.functions.text import c4_rules

WORDS = ["alpha", "beta", "Javascript", "lorem", "ipsum", "x", "{brace}", "done"]
ENDINGS = ["", ".", "!", "?", '"', ";"]

line_strat = st.builds(
    lambda ws, end: " ".join(ws) + end,
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=8),
    st.sampled_from(ENDINGS),
)
doc_strat = st.lists(line_strat, min_size=1, max_size=6).map("\n".join)


def _py_c4(text, min_words=5, min_sentences=3):
    lines = text.split("\n")
    kept = [
        l for l in lines
        if re.search(r'[.!?"]$', l.strip())
        and len([w for w in re.split(r"\s+", l.strip()) if w]) >= min_words
        and "javascript" not in l.lower()
    ]
    kept_text = "\n".join(kept)
    n_sent = len(re.findall(r"[.!?]", kept_text))
    lorem_ok = "lorem ipsum" not in text.lower()
    brace_ok = "{" not in text
    sentences_ok = n_sent >= min_sentences
    return {
        "n_lines": len(lines),
        "n_kept_lines": len(kept),
        "n_sentences": n_sent,
        "lorem_ok": lorem_ok,
        "brace_ok": brace_ok,
        "sentences_ok": sentences_ok,
        "passes": lorem_ok and brace_ok and sentences_ok and len(kept) >= 1,
    }


@given(st.lists(doc_strat, min_size=1, max_size=8))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_c4_rules_match_python_oracle(spark, docs):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["c"].asDict()
        for r in df.select("doc_id", c4_rules(F.col("text")).alias("c")).collect()
    }
    for i, d in enumerate(docs):
        want = _py_c4(d)
        for field, v in want.items():
            assert got[i][field] == v, (d, field, got[i][field], v)
