"""Streaming C4 pass-rate monitor.

The continuous twin of `functions/text.c4_report` and the watch-dog for
the `expect.c4_pass_frac_above` acceptance gate: an ingest stream's
C4-rule pass rate (Raffel et al. 2020 §2.2 — line filters + lorem-ipsum
/ curly-brace / sentence-survivor document screens) is tracked per
event-time window, so a scraper change that starts letting code pages or
placeholder text through shows up within one trigger, not at the next
batch audit.

Scale shape: NO udf anywhere — `c4_rules` is one codegen projection
(split + HOF filter + regexp counts), the window aggregate is
conditional long sums, so partial aggregation runs map-side inside each
micro-batch and the only state is |open windows| rows of a few longs.
NULL-text rows carry no signal and count in NO cell, but they are
excluded via CONDITIONAL AGGREGATION, not a row filter — a filter on
the text column gets pushed below the EventTimeWatermark node and would
silently drop the very rows whose timestamps must advance the watermark
(the stall `lm_stream` regression-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vldt_spark.functions.text import c4_rules


def stream_c4_windows(
    stream_df: DataFrame,
    ts_col: str,
    text_col: str,
    *,
    window: str = "1 day",
    watermark: str = "1 hour",
    min_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """Watermarked per-window C4-rule counts over ``text_col``.

    Returns a streaming DataFrame with (window_start, n_docs, n_pass,
    n_lorem, n_brace, n_few_sentences, pass_frac, mean_kept_frac); use
    append output mode — a window's row is final once the watermark
    passes its end.  Empty windows report NULL fractions, never a fake
    0."""
    t = F.col(text_col)
    valid = t.isNotNull()
    c = c4_rules(t, min_words=min_words, min_sentences=min_sentences)

    def cell(cond):
        return F.sum(F.when(valid & cond, F.lit(1)).otherwise(F.lit(0)))

    agg = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(
            F.sum(valid.cast("long")).alias("n_docs"),
            cell(c.getField("passes")).alias("n_pass"),
            cell(~c.getField("lorem_ok")).alias("n_lorem"),
            cell(~c.getField("brace_ok")).alias("n_brace"),
            cell(~c.getField("sentences_ok")).alias("n_few_sentences"),
            F.sum(
                F.when(valid, c.getField("kept_frac")).otherwise(F.lit(0.0))
            ).alias("__kept_sum"),
        )
    )
    n = F.col("n_docs")
    return agg.select(
        F.col("w.start").alias("window_start"),
        "n_docs", "n_pass", "n_lorem", "n_brace", "n_few_sentences",
        F.when(n > 0, F.round(F.col("n_pass") / n, 6)).alias("pass_frac"),
        F.when(n > 0, F.round(F.col("__kept_sum") / n, 6)).alias(
            "mean_kept_frac"
        ),
    )
