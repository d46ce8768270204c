"""Dataset-card summary: the one-table corpus health report.

Every serious training corpus ships with a datasheet/dataset-card (Gebru
et al. 2021, "Datasheets for Datasets"); this module computes the
quantitative half of one as a single long-format (metric, value) table a
dashboard or model card can ingest directly. It composes the engine's
existing row-local signals (quality classifier, PII screen) with corpus
aggregates, so the whole card is ONE aggregate pass over the fact table
plus one |groups|-bounded side aggregate for the concentration metrics.

Reference parity: vldt reports per-model verdict summaries
(/root/reference/vldt — per-instance validate verdicts); the card is the
corpus-level generalisation of "summarise everything the validator knows
about this data" for the north rule's input_hint table shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vldt_spark.functions.text import classifier_quality_score, pii_flags


def corpus_card(
    docs: DataFrame,
    *,
    text_col: str = "text",
    by: str = "source",
    lang_col: str | None = "lang",
    quality_threshold: float = 0.5,
    approx: bool = False,
) -> DataFrame:
    """The dataset-card metric table: (metric string, value double), one
    row per metric, values rounded half-up to 6 dp.

    Metrics: n_docs, n_chars, mean_chars, n_sources, n_langs (when
    ``lang_col`` given), distinct_text_frac (exact-dup health: 1.0 means
    no exact duplicates), empty_frac, quality_pass_frac (share with
    classifier score ≥ ``quality_threshold``), pii_frac (share matching
    any PII screen pattern), top_source_share (largest ``by`` group's
    share — the mixture-concentration number), source_entropy (Shannon
    entropy of the ``by`` distribution in nats — 0 when one source
    dominates completely, ln(n_sources) when perfectly balanced).

    Scale shape: one scalar-partial aggregate over the fact table (all
    row-local expressions, map-side combined) + one |sources|-bounded
    groupBy for the concentration metrics, combined via 1-row broadcast
    joins.  The only expensive member is the exact
    ``count_distinct(md5(text))`` — at 10^12 rows pass ``approx=True``
    to swap it (and the group distincts) for HLL
    ``approx_count_distinct``, trading the oracle-exact value for a
    single-pass sketch with no expand.
    """
    t = F.col(text_col)
    cd = F.approx_count_distinct if approx else F.count_distinct
    pii = pii_flags(t)
    any_pii = (
        pii["has_email"] | pii["has_ip"] | pii["has_phone"]
    ).cast("double")
    qpass = (
        (classifier_quality_score(t) >= F.lit(quality_threshold))
        .cast("double")
    )
    base = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum(F.length(t)).cast("double").alias("n_chars"),
        F.avg(F.length(t)).alias("mean_chars"),
        cd(F.col(by)).cast("double").alias("n_sources"),
        *(
            [cd(F.col(lang_col)).cast("double").alias("n_langs")]
            if lang_col
            else []
        ),
        (cd(F.md5(t)) / F.count(F.lit(1))).alias("distinct_text_frac"),
        F.avg((F.length(F.trim(t)) == 0).cast("double")).alias("empty_frac"),
        F.avg(qpass).alias("quality_pass_frac"),
        F.avg(any_pii).alias("pii_frac"),
    )
    grp = docs.groupBy(by).agg(F.count(F.lit(1)).alias("n"))
    # Shannon entropy needs the total inside the per-group term; fold it
    # as sum(n*ln n) and the closed form H = ln N - sum(n ln n)/N so one
    # |groups|-row aggregate suffices (no window, no second pass).
    conc = grp.agg(
        F.max("n").alias("max_n"),
        F.sum("n").alias("tot_n"),
        F.sum(F.col("n") * F.log(F.col("n"))).alias("sum_nlogn"),
    ).select(
        (F.col("max_n") / F.col("tot_n")).alias("top_source_share"),
        (
            F.log(F.col("tot_n")) - F.col("sum_nlogn") / F.col("tot_n")
        ).alias("source_entropy"),
    )
    wide = base.crossJoin(F.broadcast(conc))
    names = [c for c in wide.columns]
    stack_expr = ", ".join(f"'{n}', `{n}`" for n in names)
    long = wide.selectExpr(
        f"stack({len(names)}, {stack_expr}) as (metric, value)"
    )
    # half-up 6dp, matching the engine-wide _round6 convention
    v = F.col("value")
    rounded = F.when(
        v.isNull(), v
    ).otherwise(
        F.floor(F.abs(v) * 1e6 + F.lit(0.5)) / 1e6 * F.signum(v)
    )
    return long.select("metric", rounded.alias("value"))
