"""Round-5 ops: unigram LM scoring, as-of join, key-skew report + guard."""

import math

import pytest
from pyspark.sql import functions as F

from vldt_spark.functions.lm import unigram_lm_table, unigram_logprob
from vldt_spark.functions.asof import asof_join
from vldt_spark.plans.skew import key_skew_report
from vldt_spark.checks.suite import Suite, expect


# ---------------------------------------------------------------------------
# unigram LM
# ---------------------------------------------------------------------------


def _toks(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def test_unigram_logprob_closed_form(spark):
    # counts: c0=2, c1=2, c2=0; N=4; vocab=3 -> denom 7
    df = _toks(spark, [("a", [0, 0, 1]), ("b", [1])])
    out = {
        r["doc_id"]: r
        for r in unigram_logprob(df, 3, round_to=None).collect()
    }
    lp0 = math.log(3 / 7)
    lp1 = math.log(3 / 7)
    assert out["a"]["n_tok"] == 3
    assert out["a"]["mean_logp"] == pytest.approx((2 * lp0 + lp1) / 3)
    assert out["b"]["ppl"] == pytest.approx(math.exp(-lp1))


def test_unigram_logprob_oov_floor_and_empty(spark):
    df = _toks(spark, [("a", [0, 0]), ("oov", [99]), ("e", []), ("n", None)])
    out = {r["doc_id"]: r for r in unigram_logprob(df, 2, round_to=None).collect()}
    # N counts only in-vocab tokens: c0=2, N=2, vocab=2 -> floor = ln(1/4)
    assert out["oov"]["mean_logp"] == pytest.approx(math.log(1 / 4))
    for d in ("e", "n"):
        assert out[d]["n_tok"] == 0
        assert out[d]["mean_logp"] is None and out[d]["ppl"] is None


def test_unigram_lm_table_is_a_distribution(spark):
    df = _toks(spark, [("a", [0, 1, 1, 3])])
    rows = unigram_lm_table(df, 5).collect()
    assert len(rows) == 5  # every vocab id, including never-seen
    total = sum(math.exp(r["logp"]) for r in rows)
    assert total == pytest.approx(1.0)
    by = {r["token"]: r for r in rows}
    assert by[1]["cnt"] == 2 and by[4]["cnt"] == 0
    assert by[4]["logp"] == pytest.approx(math.log(1 / 9))


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def _ts_df(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.to_timestamp("ts")
    )


def test_asof_join_backward_inclusive(spark):
    left = _ts_df(
        spark,
        [(1, "k", "2024-01-01 10:00:00"), (2, "k", "2024-01-01 12:00:00"),
         (3, "k", "2024-01-01 08:00:00")],
        "id int, k string, ts string",
    )
    right = _ts_df(
        spark,
        [("k", "2024-01-01 09:00:00", 1.0), ("k", "2024-01-01 10:00:00", 2.0),
         ("k", "2024-01-01 11:30:00", 3.0)],
        "k string, ts string, v double",
    )
    out = {
        r["id"]: (r["asof_v"],)
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="ts"
        ).collect()
    }
    assert out[1] == (2.0,)  # equality is inclusive: 10:00 matches 10:00
    assert out[2] == (3.0,)  # most recent preceding, not first
    assert out[3] == (None,)  # nothing precedes 08:00


def test_asof_join_dedup_and_null_payload(spark):
    left = _ts_df(spark, [(1, "k", "2024-01-01 10:00:00")], "id int, k string, ts string")
    # two right rows at the same instant -> lexicographic max of payload
    right = _ts_df(
        spark,
        [("k", "2024-01-01 09:00:00", 5.0), ("k", "2024-01-01 09:00:00", 7.0)],
        "k string, ts string, v double",
    )
    row = asof_join(left, right, key="k", left_ts="ts", right_ts="ts").first()
    assert row["asof_v"] == 7.0

    # a matched right row whose payload FIELD is NULL must NOT be skipped
    # over in favor of an older non-null row
    right2 = _ts_df(
        spark,
        [("k", "2024-01-01 08:00:00", 5.0), ("k", "2024-01-01 09:30:00", None)],
        "k string, ts string, v double",
    )
    row2 = asof_join(left, right2, key="k", left_ts="ts", right_ts="ts").first()
    assert row2["asof_v"] is None
    assert str(row2["asof_ts"]).startswith("2024-01-01 09:30")


def test_asof_join_tolerance(spark):
    left = _ts_df(spark, [(1, "k", "2024-01-01 10:00:00")], "id int, k string, ts string")
    right = _ts_df(
        spark, [("k", "2024-01-01 08:00:00", 1.0)], "k string, ts string, v double"
    )
    fresh = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts", tolerance=3 * 3600
    ).first()
    stale = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts", tolerance=3600
    ).first()
    assert fresh["asof_v"] == 1.0
    assert stale["asof_v"] is None and stale["asof_ts"] is None


# ---------------------------------------------------------------------------
# key-skew report + suite guard
# ---------------------------------------------------------------------------


def test_key_skew_report_closed_form(spark):
    df = spark.createDataFrame(
        [("hot",)] * 6 + [("a",), ("b",), (None,)], "k string"
    )
    r = key_skew_report(df, "k").first()
    # 8 non-null rows over 3 keys: avg 8/3, hot 6 -> factor 2.25
    assert (r["n_rows"], r["n_keys"], r["hot_key"], r["hot_n"]) == (8, 3, "hot", 6)
    assert r["skew_factor"] == pytest.approx(2.25)
    assert r["recommended_buckets"] == 3


def test_key_skew_report_tie_break(spark):
    df = spark.createDataFrame([("a",), ("b",)], "k string")
    r = key_skew_report(df, "k").first()
    assert r["hot_key"] == "b"  # equal counts: lexicographically greatest


def test_suite_skew_factor_guard(spark):
    df = spark.createDataFrame([("hot",)] * 6 + [("a",), ("b",)], "k string")
    rep = (
        Suite(
            [
                expect.skew_factor_below("k", 3.0),
                expect.skew_factor_below("k", 2.0),
            ]
        )
        .run(df)
        .collect()
    )
    ok, bad = rep[0], rep[1]
    assert ok["passed"] and ok["metric"] == pytest.approx(2.25)
    assert not bad["passed"] and bad["threshold"] == 2.0


def test_suite_skew_factor_guard_empty(spark):
    df = spark.createDataFrame([], "k string")
    row = Suite([expect.skew_factor_below("k", 2.0)]).run(df).first()
    assert not row["passed"] and row["metric"] != row["metric"]  # NaN


def test_asof_join_plan_single_exchange(spark):
    """The as-of plan must stay one key shuffle + zero joins — the shape
    that survives 100 TB (a range-join or a pre-dedupe groupBy would add
    a join node / a second exchange)."""
    import re

    left = _ts_df(
        spark,
        [(1, "k", "2024-01-01 10:00:00")],
        "id int, k string, ts string",
    )
    right = _ts_df(
        spark, [("k", "2024-01-01 09:00:00", 1.0)], "k string, ts string, v double"
    )
    plan = (
        asof_join(left, right, key="k", left_ts="ts", right_ts="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "Join" not in plan, plan


def test_suite_mean_ppl_guard(spark):
    df = _toks(spark, [("a", [0, 0]), ("e", [])])
    # c0=2, N=2, vocab=2 -> logp0 = ln(3/4), ppl = 4/3; empty excluded
    rep = (
        Suite(
            [
                expect.mean_ppl_between("tokens", 1.0, 2.0, vocab_size=2),
                expect.mean_ppl_between("tokens", 2.0, 3.0, vocab_size=2),
            ]
        )
        .run(df)
        .collect()
    )
    ok, bad = rep[0], rep[1]
    assert ok["passed"] and ok["metric"] == pytest.approx(4 / 3, abs=1e-5)
    assert not bad["passed"]


def test_suite_mean_ppl_guard_no_scoreable(spark):
    df = _toks(spark, [("e", []), ("n", None)])
    row = (
        Suite([expect.mean_ppl_between("tokens", 1.0, 2.0, vocab_size=2)])
        .run(df)
        .first()
    )
    assert not row["passed"] and row["metric"] != row["metric"]  # NaN


def test_lm_cross_entropy_closed_form(spark):
    from vldt_spark.functions.lm import lm_cross_entropy

    ref = _toks(spark, [("r", [0, 0, 1])])   # c_ref=[2,1], N=3, denom 5
    cur = _toks(spark, [("c", [1, 1])])      # c_cur=[0,2], N=2, denom 4
    r = lm_cross_entropy(ref, cur, 2, round_to=None).first()
    assert r["n_tokens"] == 2
    assert r["cross_entropy"] == pytest.approx(-math.log(2 / 5))
    assert r["self_entropy"] == pytest.approx(-math.log(3 / 4))
    assert r["kl"] == pytest.approx(math.log(2.5) - math.log(4 / 3))
    assert r["ppl"] == pytest.approx(2.5)


def test_lm_cross_entropy_identical_and_oov(spark):
    from vldt_spark.functions.lm import lm_cross_entropy

    a = _toks(spark, [("x", [0, 1, 1, 0])])
    same = lm_cross_entropy(a, a, 2, round_to=None).first()
    assert same["kl"] == pytest.approx(0.0, abs=1e-12)

    # an OOV token in cur scores at each model's unseen floor and counts
    oov = _toks(spark, [("y", [0, 9])])
    r = lm_cross_entropy(a, oov, 2, round_to=None).first()
    assert r["n_tokens"] == 2
    # floor_ref = ln(1/(4+2)); logp_ref[0] = ln(3/6)
    expect_cross = -(math.log(3 / 6) + math.log(1 / 6)) / 2
    assert r["cross_entropy"] == pytest.approx(expect_cross)

    empty = lm_cross_entropy(a, _toks(spark, [("e", [])]), 2).first()
    assert empty["n_tokens"] == 0 and empty["kl"] is None


def test_asof_join_forward(spark):
    left = _ts_df(
        spark,
        [(1, "k", "2024-01-01 10:00:00"), (2, "k", "2024-01-01 12:30:00")],
        "id int, k string, ts string",
    )
    right = _ts_df(
        spark,
        [("k", "2024-01-01 10:00:00", 1.0), ("k", "2024-01-01 12:00:00", 2.0),
         ("k", "2024-01-01 12:00:00", 5.0)],
        "k string, ts string, v double",
    )
    out = {
        r["id"]: r
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="ts",
            direction="forward",
        ).collect()
    }
    assert out[1]["asof_v"] == 1.0      # inclusive: 10:00 matches itself
    assert out[2]["asof_v"] is None     # nothing at/after 12:30

    # nearest-after, max payload on same-instant duplicates
    left2 = _ts_df(spark, [(3, "k", "2024-01-01 11:00:00")], "id int, k string, ts string")
    row = asof_join(
        left2, right, key="k", left_ts="ts", right_ts="ts", direction="forward"
    ).first()
    assert row["asof_v"] == 5.0

    # forward tolerance voids too-distant matches
    stale = asof_join(
        left2, right, key="k", left_ts="ts", right_ts="ts",
        direction="forward", tolerance=1800,
    ).first()
    assert stale["asof_v"] is None


def test_unigram_score_pass_is_shuffle_free(spark):
    """The scoring scan must stay scan → mapInPandas with ZERO exchanges
    (the log-prob vector travels as a closure, never as a join side)."""
    df = _toks(spark, [("a", [0, 1]), ("b", [1, 1])])
    plan = (
        unigram_logprob(df, 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_asof_join_rejects_reserved_columns(spark):
    left = _ts_df(
        spark, [(1, "k", "2024-01-01 10:00:00")], "id int, k string, ts string"
    ).withColumn("__ts", F.lit(1))
    right = _ts_df(
        spark, [("k", "2024-01-01 09:00:00", 1.0)], "k string, ts string, v double"
    )
    with pytest.raises(ValueError, match="reserves column names"):
        asof_join(left, right, key="k", left_ts="ts", right_ts="ts")
