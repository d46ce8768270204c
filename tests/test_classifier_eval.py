"""Classifier-evaluation checks: exact AUC, calibration bins, ECE."""

import math

import pytest
from pyspark.sql import functions as F

from vldt_spark.checks.classifier_eval import (
    auc_by_group,
    auc_report,
    calibration_report,
    ece_report,
)
from vldt_spark.checks.suite import Suite, expect


def _df(spark, rows):
    return spark.createDataFrame(rows, "score double, label boolean")


def _ref_auc(pairs):
    """O(n²) midrank reference: mean over (pos, neg) pairs of
    1 if s_pos > s_neg, 0.5 if tied, else 0."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    tot = 0.0
    for sp in pos:
        for sn in neg:
            tot += 1.0 if sp > sn else (0.5 if sp == sn else 0.0)
    return tot / (len(pos) * len(neg))


def test_auc_matches_pairwise_reference_with_ties(spark):
    pairs = [
        (0.9, True), (0.8, True), (0.8, False), (0.7, True),
        (0.5, False), (0.5, True), (0.5, False), (0.3, False),
        (0.3, True), (0.1, False),
    ]
    row = auc_report(_df(spark, pairs), "score", "label").first()
    want = _ref_auc(pairs)
    assert row["auc"] == pytest.approx(want, abs=1e-6)
    assert row["gini"] == pytest.approx(2 * want - 1, abs=1e-6)
    assert row["n_pos"] == 5 and row["n_neg"] == 5
    assert row["n_scores"] == 6  # distinct score values


def test_auc_perfect_and_inverted_separation(spark):
    perfect = [(0.9, True), (0.8, True), (0.2, False), (0.1, False)]
    assert auc_report(_df(spark, perfect), "score", "label").first()["auc"] == 1.0
    inverted = [(s, not y) for s, y in perfect]
    assert auc_report(_df(spark, inverted), "score", "label").first()["auc"] == 0.0


def test_auc_single_class_and_nulls(spark):
    one_class = _df(spark, [(0.4, True), (0.6, True)])
    row = auc_report(one_class, "score", "label").first()
    assert row["auc"] is None and row["gini"] is None
    assert row["n_pos"] == 2 and row["n_neg"] == 0
    # NULL score / NULL label rows are excluded, not counted either side
    with_nulls = _df(
        spark,
        [(0.9, True), (0.1, False), (None, True), (0.5, None)],
    )
    row = auc_report(with_nulls, "score", "label").first()
    assert row["n_pos"] == 1 and row["n_neg"] == 1 and row["auc"] == 1.0


def test_auc_quantize_bounds_relation_and_keeps_midrank(spark):
    # 0.68 vs 0.72 collapse onto the same 0.1-grid point -> become a tie,
    # scored by the midrank convention (not dropped)
    pairs = [(0.72, True), (0.68, False), (0.2, False)]
    exact = auc_report(_df(spark, pairs), "score", "label").first()
    assert exact["auc"] == 1.0 and exact["n_scores"] == 3
    q = auc_report(_df(spark, pairs), "score", "label", quantize=10).first()
    # pos ties one neg (0.5) and beats the other (1.0) -> AUC 0.75
    assert q["auc"] == pytest.approx(0.75, abs=1e-6)
    assert q["n_scores"] == 2


def test_auc_plan_has_no_join_and_no_fact_sort(spark):
    df = _df(spark, [(0.9, True), (0.1, False), (0.5, True)])
    plan = auc_report(df, "score", "label")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # the only Sort feeds the window over the grouped relation — it must
    # sit ABOVE the per-score aggregate (the plan prints top-down, so
    # "above" = earlier in the string), never on the fact scan side
    sort_pos = plan.find("Sort")
    score_agg_pos = plan.rfind("HashAggregate")
    assert sort_pos != -1 and score_agg_pos != -1
    assert sort_pos < score_agg_pos
    assert plan.count("Sort ") <= 1 or "SortMergeJoin" not in plan


def test_calibration_bins_closed_form(spark):
    rows = [
        (0.05, False), (0.05, False), (0.15, True), (0.15, False),
        (0.95, True), (0.95, True), (1.0, True),  # 1.0 joins top bin
        (-0.2, False),  # clamps into bin 0
    ]
    got = {
        r["bin"]: r
        for r in calibration_report(
            _df(spark, rows), "score", "label", n_bins=10
        ).collect()
    }
    assert set(got) == {0, 1, 9}
    assert got[0]["n"] == 3 and got[0]["n_pos"] == 0
    assert got[0]["pos_rate"] == 0.0
    # clamped mean: (0.05 + 0.05 + 0.0) / 3
    assert got[0]["mean_score"] == pytest.approx(0.033333, abs=1e-6)
    assert got[1]["n"] == 2 and got[1]["pos_rate"] == 0.5
    assert got[9]["n"] == 3 and got[9]["pos_rate"] == 1.0
    assert got[9]["mean_score"] == pytest.approx((0.95 + 0.95 + 1.0) / 3, abs=1e-6)


def test_ece_closed_form_and_degenerate(spark):
    rows = [
        (0.05, False), (0.05, False),          # bin 0: |0 - 0.05| * 2/6
        (0.15, True), (0.15, False),           # bin 1: |0.5 - 0.15| * 2/6
        (0.95, True), (0.95, True),            # bin 9: |1.0 - 0.95| * 2/6
    ]
    want = (abs(0.0 - 0.05) * 2 + abs(0.5 - 0.15) * 2 + abs(1.0 - 0.95) * 2) / 6
    row = ece_report(_df(spark, rows), "score", "label", n_bins=10).first()
    assert row["ece"] == pytest.approx(want, abs=1e-6)
    assert row["n"] == 6 and row["n_bins_used"] == 3
    empty = ece_report(
        _df(spark, []).where(F.lit(False)), "score", "label"
    ).first()
    assert empty["ece"] is None and empty["n"] == 0


def test_ece_is_zero_for_perfectly_calibrated_bins(spark):
    # bin mean 0.25 with 1-of-4 positives; bin mean 0.75 with 3-of-4
    rows = [(0.25, True)] + [(0.25, False)] * 3 + [(0.75, True)] * 3 + [(0.75, False)]
    row = ece_report(_df(spark, rows), "score", "label", n_bins=2).first()
    assert row["ece"] == pytest.approx(0.0, abs=1e-6)


def test_suite_auc_and_ece_guards(spark):
    df = _df(
        spark,
        [(0.9, True), (0.8, True), (0.3, False), (0.1, False), (0.55, False)],
    )
    rep = {
        r["check"]: r
        for r in Suite(
            [
                expect.auc_above("score", "label", 0.9),
                expect.ece_below("score", "label", 0.9, n_bins=4),
            ],
        )
        .run(df)
        .collect()
    }
    auc = rep["auc_above"]
    assert auc["passed"] and auc["metric"] == pytest.approx(
        _ref_auc([(r["score"], r["label"]) for r in df.collect()]), abs=1e-6
    )
    assert rep["ece_below"]["passed"]
    # failing arms: the bar is strict (>), so even this perfectly
    # separating fixture (AUC exactly 1.0) fails a 1.0 bar; tiny ECE bar
    rep2 = {
        r["check"]: r
        for r in Suite(
            [
                expect.auc_above("score", "label", 1.0),
                expect.ece_below("score", "label", 1e-9, n_bins=4),
            ],
        )
        .run(df)
        .collect()
    }
    assert not rep2["auc_above"]["passed"]
    assert not rep2["ece_below"]["passed"]


def test_suite_auc_guard_single_class_fails(spark):
    df = _df(spark, [(0.9, True), (0.8, True)])
    row = (
        Suite([expect.auc_above("score", "label", 0.5)])
        .run(df)
        .first()
    )
    assert not row["passed"] and math.isnan(row["metric"])


def test_reports_validate_params(spark):
    df = _df(spark, [(0.5, True)])
    with pytest.raises(ValueError):
        auc_report(df, "score", "label", quantize=0)
    with pytest.raises(ValueError):
        calibration_report(df, "score", "label", n_bins=0)
    with pytest.raises(ValueError):
        ece_report(df, "score", "label", n_bins=-1)


def test_auc_by_group_matches_per_group_reference(spark):
    rows = [
        ("a", 0.9, True), ("a", 0.5, True), ("a", 0.5, False), ("a", 0.1, False),
        ("b", 0.2, True), ("b", 0.8, False), ("b", 0.6, False),
        ("c", 0.7, True), ("c", 0.4, True),  # single-class -> NULL auc
    ]
    df = spark.createDataFrame(rows, "grp string, score double, label boolean")
    got = {r["grp"]: r for r in auc_by_group(df, "score", "label", "grp").collect()}
    for g in ("a", "b"):
        pairs = [(s, y) for gg, s, y in rows if gg == g]
        assert got[g]["auc"] == pytest.approx(_ref_auc(pairs), abs=1e-6), g
    assert got["c"]["auc"] is None and got["c"]["n_pos"] == 2 and got["c"]["n_neg"] == 0
    # the corpus-level number can hide a failing slice: group b is inverted
    assert got["a"]["auc"] > 0.8 and got["b"]["auc"] == 0.0


def test_auc_by_group_validates_and_window_is_group_partitioned(spark):
    df = spark.createDataFrame(
        [("a", 0.9, True)], "grp string, score double, label boolean"
    )
    with pytest.raises(ValueError):
        auc_by_group(df, "score", "label", [])
    with pytest.raises(ValueError):
        auc_by_group(df, "score", "label", "grp", quantize=-1)
    plan = (
        auc_by_group(df, "score", "label", "grp")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # no single-partition stage: the running-sum window partitions by group
    assert "SinglePartition" not in plan
    assert "Join" not in plan


def test_brier_closed_form_clamping_and_empty(spark):
    from vldt_spark.checks.classifier_eval import brier_report

    rows = [(0.8, True), (0.3, False), (0.5, True), (1.2, False)]  # 1.2 clamps to 1.0
    want = ((0.8 - 1) ** 2 + (0.3 - 0) ** 2 + (0.5 - 1) ** 2 + (1.0 - 0) ** 2) / 4
    row = brier_report(_df(spark, rows), "score", "label").first()
    assert row["brier"] == pytest.approx(want, abs=1e-6)
    assert row["n"] == 4
    empty = brier_report(_df(spark, []), "score", "label").first()
    assert empty["brier"] is None and empty["n"] == 0
    # perfect forecast -> 0
    assert brier_report(
        _df(spark, [(1.0, True), (0.0, False)]), "score", "label"
    ).first()["brier"] == 0.0


def test_confusion_report_closed_form(spark):
    from vldt_spark.checks.classifier_eval import confusion_report

    rows = [
        (0.9, True), (0.7, True), (0.6, False),   # predicted positive
        (0.4, True), (0.2, False), (0.1, False),  # predicted negative
    ]
    row = confusion_report(_df(spark, rows), "score", "label", threshold=0.5).first()
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (2, 1, 1, 2)
    assert row["precision"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["recall"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["f1"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["accuracy"] == pytest.approx(4 / 6, abs=1e-6)


def test_confusion_report_zero_denominators(spark):
    from vldt_spark.checks.classifier_eval import confusion_report

    # nothing predicted positive -> precision NULL; no actual positives
    # -> recall NULL; f1 NULL either way
    none_pred = _df(spark, [(0.1, True), (0.2, False)])
    row = confusion_report(none_pred, "score", "label", threshold=0.9).first()
    assert row["precision"] is None and row["f1"] is None
    assert row["recall"] == 0.0  # tp=0, fn=1
    no_pos = _df(spark, [(0.9, False), (0.1, False)])
    row = confusion_report(no_pos, "score", "label").first()
    assert row["recall"] is None and row["precision"] == 0.0


def test_suite_brier_guard_arms(spark):
    df = _df(spark, [(0.9, True), (0.2, False), (0.7, True)])
    want = ((0.9 - 1) ** 2 + (0.2 - 0) ** 2 + (0.7 - 1) ** 2) / 3
    rep = {
        (r["check"], r["threshold"]): r
        for r in Suite(
            [
                expect.brier_below("score", "label", 0.5),
                expect.brier_below("score", "label", 0.0),
            ]
        )
        .run(df)
        .collect()
    }
    ok = rep[("brier_below", 0.5)]
    assert ok["passed"] and ok["metric"] == pytest.approx(want, abs=1e-6)
    assert not rep[("brier_below", 0.0)]["passed"]
    # empty audit slice fails loud
    row = (
        Suite([expect.brier_below("score", "label", 0.5)])
        .run(_df(spark, []))
        .first()
    )
    assert not row["passed"] and math.isnan(row["metric"])


def _ref_ap(pairs):
    """Step-interpolated tie-aware AP reference: group tied scores,
    descend thresholds, AP = Σ (pos_s / P) · round6(precision ≥ s)."""
    from collections import defaultdict

    per = defaultdict(lambda: [0, 0])
    for s, y in pairs:
        per[s][0 if y else 1] += 1
    p_tot = sum(v[0] for v in per.values())
    tp = fp = 0
    ap = 0.0
    for s in sorted(per, reverse=True):
        tp += per[s][0]
        fp += per[s][1]
        ap += per[s][0] / p_tot * round(tp / (tp + fp), 6)
    return ap


def test_pr_report_matches_stepwise_reference_with_ties(spark):
    from vldt_spark.checks.classifier_eval import pr_report

    pairs = [
        (0.9, True), (0.8, True), (0.8, False), (0.7, True),
        (0.5, False), (0.5, True), (0.5, False), (0.3, False),
        (0.3, True), (0.1, False),
    ]
    row = pr_report(_df(spark, pairs), "score", "label").first()
    assert row["average_precision"] == pytest.approx(_ref_ap(pairs), abs=1e-6)
    assert row["baseline"] == pytest.approx(0.5, abs=1e-6)
    assert row["lift"] == pytest.approx(
        _ref_ap(pairs) / 0.5, abs=2e-6
    )
    assert row["n_pos"] == 5 and row["n_neg"] == 5 and row["n_scores"] == 6


def test_pr_report_perfect_single_class_and_quantize(spark):
    from vldt_spark.checks.classifier_eval import pr_report

    perfect = [(0.9, True), (0.8, True), (0.2, False), (0.1, False)]
    assert (
        pr_report(_df(spark, perfect), "score", "label").first()[
            "average_precision"
        ]
        == 1.0
    )
    # single class: AP undefined — NULL, not a trivial 1.0
    row = pr_report(
        _df(spark, [(0.4, True), (0.6, True)]), "score", "label"
    ).first()
    assert row["average_precision"] is None and row["lift"] is None
    # quantize snaps to the 1/k grid FIRST, creating ties the step AP
    # must score as grouped blocks — and bounds the relation at k+1 rows
    pairs = [(i / 100.0, i % 3 != 0) for i in range(100)]
    row = pr_report(_df(spark, pairs), "score", "label", quantize=4).first()
    snapped = [(round(s * 4) / 4, y) for s, y in pairs]
    assert row["n_scores"] <= 5
    assert row["average_precision"] == pytest.approx(_ref_ap(snapped), abs=1e-6)


def test_threshold_sweep_closed_form_rows(spark):
    from vldt_spark.checks.classifier_eval import threshold_sweep

    rows = [(0.9, True), (0.5, True), (0.5, False), (0.1, False)]
    got = {
        r["threshold"]: r
        for r in threshold_sweep(_df(spark, rows), "score", "label").collect()
    }
    assert set(got) == {0.9, 0.5, 0.1}
    top = got[0.9]
    assert (top["tp"], top["fp"], top["fn"], top["tn"]) == (1, 0, 1, 2)
    assert top["precision"] == 1.0 and top["recall"] == 0.5
    assert top["fpr"] == 0.0
    mid = got[0.5]
    assert (mid["tp"], mid["fp"], mid["fn"], mid["tn"]) == (2, 1, 0, 1)
    assert mid["f1"] == pytest.approx(2 * (2 / 3) * 1.0 / (2 / 3 + 1.0), abs=1e-6)
    bot = got[0.1]
    assert (bot["tp"], bot["fp"], bot["fn"], bot["tn"]) == (2, 2, 0, 0)
    assert bot["accuracy"] == 0.5
    # all-positive input: fpr has a zero denominator — NULL, not fake 0
    ap_only = threshold_sweep(
        _df(spark, [(0.9, True), (0.1, True)]), "score", "label"
    ).collect()
    assert all(r["fpr"] is None for r in ap_only)
    assert all(r["precision"] == 1.0 for r in ap_only)


def test_best_threshold_ties_break_to_higher_threshold(spark):
    from vldt_spark.checks.classifier_eval import best_threshold_report

    # thresholds 0.9 and 0.5 both achieve f1 = 2/3: (tp1 fp0 fn1) vs
    # (tp2 fp2 fn0) — the report must pick the stricter 0.9 cut
    rows = [(0.9, True), (0.5, False), (0.5, False), (0.5, True), (0.1, False)]
    got = best_threshold_report(_df(spark, rows), "score", "label").collect()
    assert len(got) == 1
    assert got[0]["threshold"] == 0.9
    assert got[0]["f1"] == pytest.approx(2 / 3, abs=1e-6)
    # no positives anywhere: no threshold has a defined f1 — zero rows
    neg_only = best_threshold_report(
        _df(spark, [(0.9, False), (0.1, False)]), "score", "label"
    ).collect()
    assert neg_only == []


def test_pr_plan_has_no_join_and_no_fact_sort(spark):
    from vldt_spark.checks.classifier_eval import pr_report

    df = _df(spark, [(0.9, True), (0.1, False), (0.5, True)])
    plan = (
        pr_report(df, "score", "label")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    # the only Sort feeds the descending window over the grouped
    # relation — it must sit ABOVE the per-score aggregate
    sort_pos = plan.find("Sort")
    score_agg_pos = plan.rfind("HashAggregate")
    assert sort_pos != -1 and score_agg_pos != -1
    assert sort_pos < score_agg_pos


def test_suite_average_precision_guard_arms(spark):
    rows = [
        (0.9, True), (0.8, True), (0.8, False), (0.7, True),
        (0.5, False), (0.5, True), (0.5, False), (0.3, False),
        (0.3, True), (0.1, False),
    ]
    df = _df(spark, rows)
    want = round(_ref_ap(rows), 6)
    out = {
        (r["check"], float(r["threshold"])): r
        for r in Suite(
            [
                expect.average_precision_above("score", "label", 0.5),
                expect.average_precision_above("score", "label", 1.0),
            ]
        )
        .run(df)
        .collect()
    }
    ok = out[("average_precision_above", 0.5)]
    assert ok["passed"] is True and float(ok["metric"]) == pytest.approx(
        want, abs=1e-6
    )
    bad = out[("average_precision_above", 1.0)]
    assert bad["passed"] is False
    # single-class audit slice: metric NaN, guard fails loud
    one_class = _df(spark, [(0.4, True), (0.6, True)])
    row = (
        Suite([expect.average_precision_above("score", "label", 0.1)])
        .run(one_class)
        .first()
    )
    assert row["passed"] is False and math.isnan(float(row["metric"]))
