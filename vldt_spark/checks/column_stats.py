"""B2/B3/B4 — per-column statistics in one scan.

Generalizes the reference's per-field optionality/type introspection to
table-wide profiles: null-rate, min/max, mean, distinct cardinality
(exact or HyperLogLog++ sketch via ``approx_count_distinct``), and
quantiles (``percentile_approx`` — a mergeable sketch, so partials combine
across partitions without collecting raw data).

All columns are profiled in a SINGLE aggregate pass (one scan, map-side
partial aggregation) — never one job per column.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def column_stats(
    df: DataFrame,
    columns: Iterable[str] | None = None,
    *,
    approx_distinct: bool = True,
    rsd: float = 0.02,
    by: str | None = None,
) -> DataFrame:
    """Long-format profile: one row per column with
    (column, n, n_null, null_rate, min, max, n_distinct).

    ``by`` adds a grouping column — per-PARTITION column stats (north
    star) in the same single grouped aggregate; output cardinality is
    |groups| × |columns| regardless of row count.

    min/max stringified so heterogeneous column types fit one result schema.
    """
    cols = list(columns) if columns else [c for c in df.columns if c != by]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        dt = df.schema[c].dataType
        orderable = not isinstance(dt, (T.MapType,))
        if orderable:
            aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
            aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__min_{c}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max_{c}"))
        if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            aggs.append(F.lit(None).cast("long").alias(f"__nd_{c}"))
        elif approx_distinct:
            aggs.append(F.approx_count_distinct(c, rsd).alias(f"__nd_{c}"))
        else:
            aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
    wide = df.groupBy(by).agg(*aggs) if by else df.agg(*aggs)
    # unpivot driver-side schema manipulation: stack the per-column triples
    stacked = []
    for c in cols:
        stacked.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n"),
                F.col(f"__null_{c}").alias("n_null"),
                (F.col(f"__null_{c}") / F.col("__n")).alias("null_rate"),
                F.col(f"__min_{c}").alias("min"),
                F.col(f"__max_{c}").alias("max"),
                F.col(f"__nd_{c}").alias("n_distinct"),
            )
        )
    keys = [F.col(by)] if by else []
    return wide.select(*keys, F.explode(F.array(*stacked)).alias("s")).select(
        *([by] if by else []), "s.*"
    )


def numeric_quantiles(
    df: DataFrame,
    columns: Iterable[str],
    probs: Sequence[float] = (0.01, 0.25, 0.5, 0.75, 0.99),
    *,
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Quantiles per column, one aggregate pass. ``exact=False`` uses the
    mergeable approx-percentile sketch (the only option at 10^12 rows);
    ``exact=True`` uses ``percentile`` for small oracle-checked runs."""
    plit = F.array(*[F.lit(p) for p in probs])
    aggs = []
    for c in columns:
        if exact:
            aggs.append(F.percentile(F.col(c), plit).alias(f"__q_{c}"))
        else:
            aggs.append(
                F.percentile_approx(F.col(c), plit, accuracy).alias(f"__q_{c}")
            )
    wide = df.agg(*aggs)
    stacked = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__q_{c}").cast("array<double>").alias("quantiles"),
        )
        for c in columns
    ]
    out = wide.select(F.explode(F.array(*stacked)).alias("s")).select("s.*")
    probs_col = F.array(*[F.lit(float(p)) for p in probs])
    return out.select(
        "column",
        F.explode(F.arrays_zip(probs_col.alias("p"), F.col("quantiles").alias("q"))).alias("z"),
    ).select("column", F.col("z.p").alias("p"), F.col("z.q").alias("q"))


def column_profile(df: DataFrame, columns: Iterable[str] | None = None) -> DataFrame:
    """column_stats + numeric mean/stddev in the same single pass."""
    cols = list(columns) if columns else df.columns
    numeric = [
        c for c in cols if isinstance(df.schema[c].dataType, T.NumericType)
    ]
    base = column_stats(df, cols)
    if not numeric:
        return base.withColumn("mean", F.lit(None).cast("double")).withColumn(
            "stddev", F.lit(None).cast("double")
        )
    aggs = []
    for c in numeric:
        aggs.append(F.avg(c).alias(f"__avg_{c}"))
        aggs.append(F.stddev_pop(c).alias(f"__sd_{c}"))
    wide = df.agg(*aggs)
    stacked = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__avg_{c}").alias("mean"),
            F.col(f"__sd_{c}").alias("stddev"),
        )
        for c in numeric
    ]
    means = wide.select(F.explode(F.array(*stacked)).alias("s")).select("s.*")
    return base.join(F.broadcast(means), "column", "left")


def zscore_outliers(
    df: DataFrame, columns: Iterable[str], *, z: float = 4.0
) -> DataFrame:
    """Per-column count of values beyond mean ± z·stddev_pop (B2 companion:
    the classic data-quality outlier screen).

    Two aggregate passes, both with map-side partial combine: pass 1
    computes the moments (|columns| numbers — each engine derives its own
    thresholds, so no cross-engine float literals are baked in); pass 2
    counts threshold crossings. At 100 TB, pass 1 can run on a hash sample
    or reuse a previous profile — thresholds need representativeness, not
    exactness. Returns (column, n, mean, stddev, lo, hi, n_below, n_above).
    """
    cols = list(columns)
    moments = df.agg(
        *[F.avg(c).alias(f"__avg_{c}") for c in cols],
        *[F.stddev_pop(c).alias(f"__sd_{c}") for c in cols],
    ).first()
    aggs = [F.count(F.lit(1)).alias("__n")]
    bounds = {}
    for c in cols:
        mu_raw, sd_raw = moments[f"__avg_{c}"], moments[f"__sd_{c}"]
        if mu_raw is None or sd_raw is None:
            # all-null column / empty table: no thresholds exist — report
            # NaN moments with zero crossings instead of crashing on
            # float(None)
            bounds[c] = (float("nan"), float("nan"), float("nan"), float("nan"))
            aggs.append(F.lit(0).cast("long").alias(f"__below_{c}"))
            aggs.append(F.lit(0).cast("long").alias(f"__above_{c}"))
            continue
        mu, sd = float(mu_raw), float(sd_raw)
        lo, hi = mu - z * sd, mu + z * sd
        bounds[c] = (mu, sd, lo, hi)
        aggs.append(
            F.coalesce(F.sum((F.col(c) < F.lit(lo)).cast("long")), F.lit(0)).alias(f"__below_{c}")
        )
        aggs.append(
            F.coalesce(F.sum((F.col(c) > F.lit(hi)).cast("long")), F.lit(0)).alias(f"__above_{c}")
        )
    wide = df.agg(*aggs)
    stacked = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n"),
            F.lit(bounds[c][0]).alias("mean"),
            F.lit(bounds[c][1]).alias("stddev"),
            F.lit(bounds[c][2]).alias("lo"),
            F.lit(bounds[c][3]).alias("hi"),
            F.col(f"__below_{c}").alias("n_below"),
            F.col(f"__above_{c}").alias("n_above"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*stacked)).alias("s")).select("s.*")


def frequent_values(df: DataFrame, column: str, *, k: int = 10) -> DataFrame:
    """Exact top-k most frequent non-null values with counts.

    groupBy count is a map-side-combined aggregate of value-cardinality
    output; the k-row head plans as TakeOrderedAndProject (per-partition
    top-k, single k-row merge — never a global sort). Ties break on the
    value itself so the result is deterministic across partitionings.
    """
    counts = (
        df.where(F.col(column).isNotNull())
        .groupBy(column)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counts.orderBy(F.desc("n"), F.asc(column)).limit(k)


def mad_outliers(
    df: DataFrame, columns: Iterable[str], *, k: float = 6.0, approx: bool = False
) -> DataFrame:
    """Robust twin of `zscore_outliers`: count values beyond
    median ± k·MAD, where MAD = median(|x − median|).  Unlike
    mean/stddev, the median/MAD thresholds do not move when the outliers
    themselves are extreme — the screen that still works when a column
    is 1% garbage at 10^9× magnitude (where z-scores silently pass
    everything because stddev exploded).

    Three bounded passes: (1) per-column medians, (2) per-column MADs
    (abs-deviation depends on pass 1), (3) one fused crossing count —
    each a whole-table aggregate with map-side combine whose output is
    |columns| numbers.  ``approx=True`` swaps exact interpolated
    percentiles for `percentile_approx` sketches — the 100 TB path
    (mergeable, bounded memory); the exact default is what the SQL
    oracle replays.  Returns (column, n, median, mad, lo, hi, n_below,
    n_above); an all-null column reports NaN thresholds and zero
    crossings.
    """
    cols = list(columns)
    half = F.lit(0.5)

    def _pct(c: Column) -> Column:
        return (
            F.percentile_approx(c, half, 10000) if approx else F.percentile(c, half)
        )

    med_row = df.agg(
        *[_pct(F.col(c)).alias(f"__med_{c}") for c in cols]
    ).first()
    meds = {c: med_row[f"__med_{c}"] for c in cols}
    mad_row = df.agg(
        *[
            _pct(F.abs(F.col(c) - F.lit(float(meds[c]))))
            .alias(f"__mad_{c}")
            if meds[c] is not None
            else F.lit(None).cast("double").alias(f"__mad_{c}")
            for c in cols
        ]
    ).first()
    aggs = [F.count(F.lit(1)).alias("__n")]
    bounds = {}
    for c in cols:
        med_raw, mad_raw = meds[c], mad_row[f"__mad_{c}"]
        if med_raw is None or mad_raw is None:
            bounds[c] = (float("nan"),) * 4
            aggs.append(F.lit(0).cast("long").alias(f"__below_{c}"))
            aggs.append(F.lit(0).cast("long").alias(f"__above_{c}"))
            continue
        med, mad = float(med_raw), float(mad_raw)
        lo, hi = med - k * mad, med + k * mad
        bounds[c] = (med, mad, lo, hi)
        aggs.append(
            F.coalesce(
                F.sum((F.col(c) < F.lit(lo)).cast("long")), F.lit(0)
            ).alias(f"__below_{c}")
        )
        aggs.append(
            F.coalesce(
                F.sum((F.col(c) > F.lit(hi)).cast("long")), F.lit(0)
            ).alias(f"__above_{c}")
        )
    wide = df.agg(*aggs)
    stacked = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n"),
            F.round(F.lit(bounds[c][0]), 6).alias("median"),
            F.round(F.lit(bounds[c][1]), 6).alias("mad"),
            F.round(F.lit(bounds[c][2]), 6).alias("lo"),
            F.round(F.lit(bounds[c][3]), 6).alias("hi"),
            F.col(f"__below_{c}").alias("n_below"),
            F.col(f"__above_{c}").alias("n_above"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*stacked)).alias("s")).select("s.*")
