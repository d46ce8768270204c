"""Gap-based sessionization over event tables.

Two complementary paths with identical session semantics (a new session
starts when an event is MORE than ``gap_seconds`` after the previous
event of the same key — an event exactly gap-distant still merges,
matching ``session_window``'s closed merge interval; a session's end is
its last event + gap):

  * ``sessionize`` — per-EVENT session labels via the SQL-islands
    construction (lag + cumulative sum over a per-key window). Use when
    every event needs its session id (feature engineering, joins).
  * ``session_stats`` — per-SESSION aggregates via Spark's native
    ``session_window``, the scale path: a single aggregation whose
    map-side partial merges adjacent windows, no window function, and
    the same operator runs unchanged under Structured Streaming with a
    watermark (late events merge sessions exactly like batch).

Scale: both shuffle once, keyed on the session key. ``sessionize``'s
per-key window sorts within each key only (no global sort); a hot key
(bot traffic) concentrates one reducer — cap or pre-filter hot keys, or
use ``session_stats`` whose partial aggregation absorbs skew map-side.
Gap comparisons are integer microseconds (``unix_micros``), so the
boundary rule is exact and reproducible in ANSI SQL (epoch_us) for the
oracle gate.

Reference scope analogue: vldt validates rows one at a time
(/root/reference/vldt/models.py); event sessionization belongs to the
distributed analytics surface layered on top (SURVEY.md §2 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check_gap(gap_seconds: float) -> int:
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be > 0, got {gap_seconds}")
    return int(round(gap_seconds * 1_000_000))


def sessionize(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    gap_seconds: float,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Label every event with a per-key ``session_idx`` (1-based, in time
    order). SQL-islands: flag events whose distance to the previous event
    of the same key is STRICTLY greater than gap (or that have no
    predecessor), then running-sum the flags. ``order_cols`` breaks timestamp ties deterministically
    (defaults to the timestamp alone; equal-timestamp events always share
    a session either way, so labels are stable regardless)."""
    gap_us = _check_gap(gap_seconds)
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    # timestamp subtraction -> day-time interval: exact to the microsecond,
    # works for both TIMESTAMP and TIMESTAMP_NTZ columns, and immune to
    # timezone/DST reinterpretation (unlike unix_micros, which rejects NTZ)
    prev = F.lag(F.col(ts_col)).over(w)
    gap_lit = F.expr(f"INTERVAL '{gap_us}' MICROSECOND")
    new_session = prev.isNull() | ((F.col(ts_col) - prev) > gap_lit)
    return events.withColumn(
        "session_idx",
        F.sum(new_session.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    gap_seconds: float,
    value_col: str | None = None,
) -> DataFrame:
    """Per-session aggregates via native ``session_window``: one
    aggregation pass, mergeable partials (adjacent windows combine
    map-side), streaming-ready. Returns (key, session_start = first event,
    session_end = last event + gap, n_events[, sum_<value> rounded to 6
    decimals — deterministic across engines despite float addition
    order])."""
    gap_us = _check_gap(gap_seconds)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 6).alias(f"sum_{value_col}"))
    win = F.session_window(F.col(ts_col), f"{gap_us} microseconds")
    return (
        events.groupBy(F.col(key_col), win.alias("__w"))
        .agg(*aggs)
        .select(
            key_col,
            F.col("__w.start").alias("session_start"),
            F.col("__w.end").alias("session_end"),
            "n_events",
            *([f"sum_{value_col}"] if value_col is not None else []),
        )
    )
