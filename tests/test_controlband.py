"""Control-band monitoring over metric time series: Shewhart + EWMA
bands from each point's PRECEDING history (checks/controlband.py)."""

import datetime as dt

import pytest

from vldt_spark.checks.controlband import control_alarms, metric_control_report


def _series(spark, values, series="a"):
    rows = [
        (series, dt.datetime(2024, 1, 1) + dt.timedelta(days=i), float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "s string, ts timestamp, value double")


def test_spike_alarms_and_closed_form_stats(spark):
    df = _series(spark, [10, 12, 11, 30])
    out = metric_control_report(
        df, by="s", window=3, k=2.0, alpha=0.5
    ).orderBy("ts").collect()
    # first three points: < 3 trailing points -> no verdict
    for r in out[:3]:
        assert r["z"] is None and r["shewhart_alarm"] is None
    r = out[3]
    assert r["n_trailing"] == 3
    assert r["trailing_mean"] == 11.0 and r["trailing_std"] == 1.0
    assert r["z"] == 19.0 and r["shewhart_alarm"] is True
    # renormalized truncated EWMA: (.5*11 + .25*12 + .125*10) / .875
    assert r["ewma_prev"] == pytest.approx(9.75 / 0.875, abs=1e-6)
    assert r["ewma_alarm"] is True


def test_constant_history_gives_no_verdict(spark):
    # zero trailing std: a band cannot be estimated, alarms stay NULL
    df = _series(spark, [5, 5, 5, 99])
    r = metric_control_report(df, by="s", window=3).orderBy("ts").collect()[3]
    assert r["trailing_std"] == 0.0
    assert r["z"] is None and r["shewhart_alarm"] is None and r["ewma_alarm"] is None


def test_inlier_does_not_alarm(spark):
    df = _series(spark, [10, 12, 11, 11.5])
    r = metric_control_report(df, by="s", window=3, k=2.0).orderBy("ts").collect()[3]
    assert r["shewhart_alarm"] is False and r["ewma_alarm"] is False


def test_series_are_independent(spark):
    a = _series(spark, [10, 12, 11, 30], series="a")
    b = _series(spark, [100, 102, 101, 101.5], series="b")
    rep = metric_control_report(
        a.unionByName(b), by="s", window=3, k=2.0
    )
    got = {(r["s"], r["ts"]): r for r in rep.collect()}
    assert got[("a", dt.datetime(2024, 1, 4))]["shewhart_alarm"] is True
    assert got[("b", dt.datetime(2024, 1, 4))]["shewhart_alarm"] is False
    # series b's history must not leak into series a's bands
    assert got[("a", dt.datetime(2024, 1, 4))]["trailing_mean"] == 11.0


def test_control_alarms_filters_to_alarming_points(spark):
    df = _series(spark, [10, 12, 11, 30, 11, 10.5])
    rows = control_alarms(df, by="s", window=3, k=2.0).collect()
    assert [r["value"] for r in rows] == [30.0]


def test_window_validation(spark):
    df = _series(spark, [1, 2])
    with pytest.raises(ValueError):
        metric_control_report(df, by="s", window=0)
