"""Property-based invariants for the token boilerplate-affix family
(tokens.token_affix_report / strip_affix) against a pure-Python oracle
over randomized small token tables.

One hypothesis example = one small Spark job, so max_examples stays
low; each example still covers a whole randomized table.
"""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vldt_spark.functions.tokens import strip_affix, token_affix_report

tokens_strat = st.lists(
    st.one_of(st.none(), st.lists(st.integers(0, 5), max_size=6)),
    min_size=1,
    max_size=12,
)


def _py_prefix_groups(rows, k):
    """Pure-Python oracle: prefix tuple -> sorted doc ids, eligible ids."""
    groups = {}
    eligible = []
    for i, toks in rows:
        if toks is not None and len(toks) >= k:
            eligible.append(i)
            groups.setdefault(tuple(toks[:k]), []).append(i)
    return groups, eligible


@given(tokens_strat)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_affix_report_matches_python_oracle(spark, token_lists):
    k = 2
    rows = list(enumerate(token_lists))
    df = spark.createDataFrame(
        [(i, t) for i, t in rows], "doc_id long, tokens array<int>"
    )
    got = {
        tuple(r["affix"]): r
        for r in token_affix_report(
            df, k=k, side="prefix", min_docs=2, top=100
        ).collect()
    }
    groups, eligible = _py_prefix_groups(rows, k)
    expect = {p: ids for p, ids in groups.items() if len(ids) >= 2}
    assert set(got) == set(expect)
    for p, ids in expect.items():
        assert got[p]["n_docs"] == len(ids)
        assert got[p]["exemplar_id"] == min(ids)
        if eligible:
            assert got[p]["doc_share"] == round(len(ids) / len(eligible), 6)


@given(tokens_strat)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_strip_affix_invariants(spark, token_lists):
    k = 2
    rows = list(enumerate(token_lists))
    df = spark.createDataFrame(
        [(i, t) for i, t in rows], "doc_id long, tokens array<int>"
    )
    out = {r["doc_id"]: r for r in strip_affix(df, k=k, side="prefix").collect()}
    groups, _ = _py_prefix_groups(rows, k)
    dup_prefixes = {p for p, ids in groups.items() if len(ids) >= 2}
    for i, toks in rows:
        r = out[i]
        if toks is None:
            assert r["tokens"] is None and not r["affix_stripped"]
        elif len(toks) >= k and tuple(toks[:k]) in dup_prefixes:
            # stripped: exactly the first k tokens removed, never more
            assert r["affix_stripped"] and r["tokens"] == toks[k:]
        else:
            assert not r["affix_stripped"] and r["tokens"] == toks
    # row count preserved — strip never drops or duplicates rows
    assert len(out) == len(rows)


@given(tokens_strat)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_report_and_strip_are_consistent(spark, token_lists):
    # every affix the report names with n_docs >= min_docs is stripped
    # from exactly n_docs rows
    k = 2
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(token_lists)],
        "doc_id long, tokens array<int>",
    )
    rep = token_affix_report(df, k=k, side="prefix", min_docs=2, top=100).collect()
    stripped = strip_affix(df, k=k, side="prefix").where("affix_stripped").count()
    assert stripped == sum(r["n_docs"] for r in rep)
