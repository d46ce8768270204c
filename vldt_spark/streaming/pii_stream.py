"""Streaming PII-rate monitor.

The continuous twin of `functions/text.pii_report` and the watch-dog for
the `expect.pii_frac_below` acceptance gate: an ingest stream's
PII-screen match rate is tracked per event-time window, so a scraper
change that suddenly lets contact pages through shows up within one
trigger — not at the next batch audit. Operators route a window whose
`pii_frac` spikes to a `pii_redact` pass (or quarantine) before the data
reaches a training shard.

Scale shape: NO udf anywhere — the three screens are codegen `rlike`
expressions, the window aggregate is conditional long sums, so partial
aggregation runs map-side inside each micro-batch and the only state is
|open windows| rows of five longs. NULL-text rows carry no signal and
count in NO cell, but they are excluded via CONDITIONAL AGGREGATION,
not a row filter — a filter on the text column gets pushed below the
EventTimeWatermark node and would silently drop the very rows whose
timestamps must advance the watermark (the stall `lm_stream`
regression-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vldt_spark.functions.text import PII_PATTERNS


def stream_pii_windows(
    stream_df: DataFrame,
    ts_col: str,
    text_col: str,
    *,
    window: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked per-window PII screen counts over ``text_col``.

    Returns a streaming DataFrame with (window_start, n_docs, n_email,
    n_ip, n_phone, n_any, pii_frac); use append output mode — a window's
    row is final once the watermark passes its end. Empty-text windows
    report NULL pii_frac, never a fake 0."""
    t = F.col(text_col)
    valid = t.isNotNull()
    hits = {kind: t.rlike(pat) for kind, pat in PII_PATTERNS}
    any_hit = hits["email"] | hits["ip"] | hits["phone"]

    def cell(cond):
        return F.sum(F.when(valid & cond, F.lit(1)).otherwise(F.lit(0)))

    agg = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(
            F.sum(valid.cast("long")).alias("n_docs"),
            cell(hits["email"]).alias("n_email"),
            cell(hits["ip"]).alias("n_ip"),
            cell(hits["phone"]).alias("n_phone"),
            cell(any_hit).alias("n_any"),
        )
    )
    n = F.col("n_docs")
    return agg.select(
        F.col("w.start").alias("window_start"),
        "n_docs", "n_email", "n_ip", "n_phone", "n_any",
        F.when(n > 0, F.round(F.col("n_any") / n, 6)).alias("pii_frac"),
    )
