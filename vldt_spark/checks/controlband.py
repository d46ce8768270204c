"""Control-band monitoring over metric time series.

The drift checks (`checks/drift.py`) compare two static corpora; the
streaming monitors watch one window at a time.  This module closes the
remaining gap: ALARMING ON A METRIC SERIES OVER TIME — the shape of the
ledger's per-partition metrics table, a per-day validation pass rate, a
per-window PII fraction — so a slow regression that no single-window
guard trips (each window individually "looks fine") is caught the
moment it departs its own trailing distribution.

Two published control-chart rules per point, both computed from the
point's own PRECEDING history (never including the point itself, so an
outlier cannot mask its own alarm):

- Shewhart bands: |x_t − mean(x_{t−w..t−1})| > k · std(x_{t−w..t−1});
- EWMA bands (Roberts 1959): the truncated-horizon exponentially
  weighted mean E_{t−1} = Σ_{j=1..w} α(1−α)^{j−1} x_{t−j} (weights
  renormalized over the lags that exist), alarm when
  |x_t − E_{t−1}| > k · std.

Scale shape: the INPUT is a monitoring table — |series| × |time
buckets| rows, bounded by construction, because the corpus-sized work
already happened in the upstream per-window aggregation.  The plan is
ONE exchange on the series key and a per-series ordered window whose
frame is w rows; at 10^12-sequence scale the series table for a year of
daily buckets across 10^4 sources is 3.7M rows — driver-trivial.  The
EWMA is expressed as w explicit lag terms (pure Catalyst expressions,
no recurrence, no UDF), which keeps the whole report inside
whole-stage codegen and makes it replayable exactly in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def metric_control_report(
    metrics: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    by: str | list[str] | None = None,
    window: int = 8,
    k: float = 3.0,
    alpha: float = 0.3,
) -> DataFrame:
    """Per-point control-band report over a metric series.

    Returns the input keys plus ``(n_trailing, trailing_mean,
    trailing_std, z, shewhart_alarm, ewma_prev, ewma_alarm)``.  Points
    with fewer than 3 preceding points, or a zero/degenerate trailing
    std, report NULL z and NULL alarms — a verdict is never fabricated
    from an unestimable band.  Floats are rounded half-up to 6dp.

    ``by`` names the series key column(s); ``window`` is the trailing
    history length w; ``k`` the band width in trailing sigmas; ``alpha``
    the EWMA smoothing weight.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    keys = [by] if isinstance(by, str) else list(by or [])
    w = (
        Window.partitionBy(*[F.col(c) for c in keys])
        if keys
        else Window.partitionBy(F.lit(1))
    ).orderBy(F.col(ts_col))
    trail = w.rowsBetween(-window, -1)

    x = F.col(value_col)
    n_tr = F.count(x).over(trail)
    mean_tr = F.avg(x).over(trail)
    std_tr = F.stddev_samp(x).over(trail)

    # truncated-horizon EWMA of the PRECEDING points: explicit lag terms
    # (no recurrence), weights renormalized over the lags that exist so
    # early points use their full available history.
    num: Column = F.lit(0.0)
    den: Column = F.lit(0.0)
    for j in range(1, window + 1):
        wj = alpha * (1.0 - alpha) ** (j - 1)
        lj = F.lag(x, j).over(w)
        num = num + F.coalesce(lj * F.lit(wj), F.lit(0.0))
        den = den + F.when(lj.isNotNull(), F.lit(wj)).otherwise(F.lit(0.0))
    ewma_prev = F.when(den > 0, num / den)

    ok = (n_tr >= 3) & std_tr.isNotNull() & (std_tr > 0)
    z = F.when(ok, (x - mean_tr) / std_tr)
    shewhart = F.when(ok, F.abs(x - mean_tr) > F.lit(float(k)) * std_tr)
    ewma_alarm = F.when(
        ok & ewma_prev.isNotNull(),
        F.abs(x - ewma_prev) > F.lit(float(k)) * std_tr,
    )

    return metrics.select(
        *keys,
        F.col(ts_col),
        x.alias(value_col),
        n_tr.alias("n_trailing"),
        F.round(mean_tr, 6).alias("trailing_mean"),
        F.round(std_tr, 6).alias("trailing_std"),
        F.round(z, 6).alias("z"),
        shewhart.alias("shewhart_alarm"),
        F.round(ewma_prev, 6).alias("ewma_prev"),
        ewma_alarm.alias("ewma_alarm"),
    )


def control_alarms(
    metrics: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    by: str | list[str] | None = None,
    window: int = 8,
    k: float = 3.0,
    alpha: float = 0.3,
) -> DataFrame:
    """Only the alarming points of `metric_control_report` — the rows an
    operator pages on.  Same plan; the filter sits above the window
    projection."""
    rep = metric_control_report(
        metrics,
        ts_col=ts_col,
        value_col=value_col,
        by=by,
        window=window,
        k=k,
        alpha=alpha,
    )
    return rep.where(
        F.coalesce(F.col("shewhart_alarm"), F.lit(False))
        | F.coalesce(F.col("ewma_alarm"), F.lit(False))
    )
