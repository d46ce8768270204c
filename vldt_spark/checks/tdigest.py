"""B4 — t-digest quantile sketch (north star names it explicitly).

``percentile_approx`` (column_stats.py) is Spark's built-in mergeable
quantile sketch; this module adds a REAL t-digest — Dunning's merging
variant with the k1 (arcsine) scale function — because the north star
asks for t-digest semantics specifically: relative accuracy that is
tightest at the tails (q→0/1), a fixed per-group memory bound
(≤ ``compression`` centroids), and digests that merge associatively so
partials combine across partitions/days/tables without raw data.

Spark-first plan (mirrors how percentile_approx executes, but in
Arrow-vectorized numpy instead of JVM internals):

1. partial fold — ``mapInPandas`` builds one digest per (Arrow batch ×
   group): sort values, assign each to a k1-scale bucket (vectorized
   ``np.bincount`` weighted fold, no Python loop over rows), emit
   (group, means[], weights[], min, max) rows of ≤ ~2·compression
   centroids. Token arrays / raw values never leave the partition.
2. merge — the bounded partial rows (|groups| × |batches|, each ≤ a few
   KB) shuffle to one reducer per group; ``applyInPandas`` concatenates
   centroid lists, re-compresses with the same scale function, and
   evaluates the requested quantiles. The exchange carries digest
   partials only — at 10^12 rows the shuffle volume is
   |groups| × |partitions| × compression, independent of row count.

Exactness contract (what the oracle checks): while a group's centroid
count stays ≤ compression, every point is its own singleton centroid and
``quantile`` uses exact order-statistic interpolation (position p·(n−1),
the same rule as Spark ``percentile`` / DuckDB ``quantile_cont``) — so
the whole distributed pipeline (batch fold → shuffle → merge →
interpolate) is value-checked bit-exactly by the SQL oracle in that
regime. Once compressed, centroids carry (mean, weight) and ``quantile``
switches to the standard t-digest midpoint rule; accuracy vs exact
percentiles and merge-associativity are pytest-asserted with rank-error
bounds (tails tighter than the middle, the t-digest property).

Reference parity note: roman-right/vldt has no sketch surface (it is a
row-wise validation kernel); this implements the north-star's
"t-digest quantiles" distributed-check requirement from scratch.
"""

from __future__ import annotations

import math
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------- numpy core


def _k1_bucket(cum_mid: np.ndarray, total: float, compression: int) -> np.ndarray:
    """k1 scale-function bucket index for each cluster midpoint.

    k(q) = (δ / 2π) · asin(2q − 1); clusters whose k-values floor to the
    same integer merge. Tail buckets are narrow in q (singletons survive
    near q=0/1), center buckets are wide — the t-digest accuracy shape.
    """
    q = np.clip(cum_mid / total, 0.0, 1.0)
    k = (compression / (2.0 * math.pi)) * np.arcsin(2.0 * q - 1.0)
    return np.floor(k).astype(np.int64)


def _compress(
    means: np.ndarray, weights: np.ndarray, compression: int
) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted (means, weights) into ≤ ~compression/2 + tails
    centroids via one vectorized bucket-assignment pass (the one-pass
    k1-bucket merging variant; no per-row Python loop)."""
    if means.size <= compression:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    cum = np.cumsum(weights)
    mid = cum - weights / 2.0
    bucket = _k1_bucket(mid, total, compression)
    # bucket ids are sorted (means sorted ⇒ mid sorted ⇒ k monotone)
    _, start = np.unique(bucket, return_index=True)
    seg = np.zeros(means.size, dtype=np.int64)
    seg[start] = 1
    seg = np.cumsum(seg) - 1
    w_out = np.bincount(seg, weights=weights)
    m_out = np.bincount(seg, weights=weights * means) / w_out
    return m_out, w_out


def _fold_values(
    values: np.ndarray, compression: int
) -> tuple[np.ndarray, np.ndarray]:
    """Digest a raw value array: sort, weight-1 singletons, compress."""
    v = np.sort(values[~np.isnan(values)])
    return _compress(v, np.ones(v.size, dtype=np.float64), compression)


def _quantiles(
    means: np.ndarray,
    weights: np.ndarray,
    vmin: float,
    vmax: float,
    probs: Sequence[float],
) -> list[float]:
    """Quantile estimates from a merged digest.

    Singleton regime (all weights == 1): exact order statistics with
    linear interpolation at position p·(n−1) — identical to Spark
    ``percentile`` and DuckDB ``quantile_cont``, so the oracle can check
    the distributed pipeline bit-exactly. Compressed regime: standard
    t-digest midpoint interpolation between centroids, clamped to the
    true [min, max] observed (tracked exactly through the fold)."""
    n = float(weights.sum())
    if n == 0:
        return [float("nan") for _ in probs]
    if np.all(weights == 1.0):
        out = []
        m = means  # sorted
        for p in probs:
            pos = p * (m.size - 1)
            lo = int(math.floor(pos))
            hi = min(lo + 1, m.size - 1)
            frac = pos - lo
            out.append(float(m[lo] + (m[hi] - m[lo]) * frac))
        return out
    cum = np.cumsum(weights) - weights / 2.0  # centroid midpoints
    out = []
    for p in probs:
        target = p * n
        if target <= cum[0]:
            out.append(float(vmin + (means[0] - vmin) * max(target, 0.0) / cum[0])
                       if cum[0] > 0 else float(vmin))
            continue
        if target >= cum[-1]:
            span = n - cum[-1]
            frac = (target - cum[-1]) / span if span > 0 else 0.0
            out.append(float(means[-1] + (vmax - means[-1]) * min(frac, 1.0)))
            continue
        i = int(np.searchsorted(cum, target, side="right")) - 1
        span = cum[i + 1] - cum[i]
        frac = (target - cum[i]) / span if span > 0 else 0.0
        out.append(float(means[i] + (means[i + 1] - means[i]) * frac))
    return out


# ---------------------------------------------------------------- Spark plan


def tdigest_quantiles(
    df: DataFrame,
    col: str,
    probs: Sequence[float] = (0.01, 0.25, 0.5, 0.75, 0.99),
    *,
    by: str | None = None,
    compression: int = 200,
) -> DataFrame:
    """Distributed t-digest quantiles of ``col``: returns
    (``by``?, p:double, q:double), one row per (group, prob).

    Two-stage mergeable plan (module docstring): Arrow-batch partial
    digests, then one bounded merge per group. Output cardinality is
    |groups| × |probs|; shuffle volume is digest partials only.
    """
    probs = [float(p) for p in probs]
    key = [F.col(by).cast("string").alias(by)] if by else []
    src = df.select(*key, F.col(col).cast("double").alias("__v")).where(
        F.col("__v").isNotNull()
    )

    partial_schema = (
        (f"{by} string, " if by else "")
        + "means array<double>, weights array<double>, vmin double, vmax double"
    )
    # match the source's group-key type by casting back in the merge output
    by_type = df.schema[by].dataType.simpleString() if by else None

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            if by:
                groups = pdf.groupby(by, sort=False, dropna=False)
            else:
                groups = [(None, pdf)]
            for gkey, gpdf in groups:
                v = gpdf["__v"].to_numpy(dtype=np.float64)
                v = v[~np.isnan(v)]
                if v.size == 0:
                    continue
                m, w = _fold_values(v, compression)
                row = {
                    "means": m.tolist(),
                    "weights": w.tolist(),
                    "vmin": float(v.min()),
                    "vmax": float(v.max()),
                }
                if by:
                    row[by] = gkey
                rows.append(row)
            if rows:
                yield pd.DataFrame(rows)

    partials = src.mapInPandas(fold, schema=partial_schema)

    out_schema = (f"{by} string, " if by else "") + "p double, q double"

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        means = np.concatenate([np.asarray(m, dtype=np.float64) for m in pdf["means"]])
        weights = np.concatenate(
            [np.asarray(w, dtype=np.float64) for w in pdf["weights"]]
        )
        order = np.argsort(means, kind="stable")
        m, w = _compress(means[order], weights[order], compression)
        qs = _quantiles(
            m, w, float(pdf["vmin"].min()), float(pdf["vmax"].max()), probs
        )
        out = {"p": probs, "q": qs}
        if by:
            out[by] = [pdf[by].iloc[0]] * len(probs)
        return pd.DataFrame(out)

    if by:
        merged = partials.groupBy(by).applyInPandas(merge, schema=out_schema)
        return merged.select(
            F.col(by).cast(by_type).alias(by), "p", "q"
        ).orderBy(by, "p")
    merged = partials.groupBy(F.lit(1).alias("__g")).applyInPandas(
        lambda pdf: merge(pdf).assign(__g=1), schema="__g int, " + out_schema
    ).drop("__g")
    return merged.orderBy("p")


def merge_digests(
    partials: DataFrame, *, by: str | None = None, compression: int = 200
) -> DataFrame:
    """Merge a table of digest partials (means, weights, vmin, vmax) into
    one digest row per group — the cross-run composition path: persist
    per-day partial digests, merge a month without re-reading raw data."""
    key = [by] if by else []
    out_schema = (
        (f"{by} string, " if by else "")
        + "means array<double>, weights array<double>, vmin double, vmax double"
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        means = np.concatenate([np.asarray(m, dtype=np.float64) for m in pdf["means"]])
        weights = np.concatenate(
            [np.asarray(w, dtype=np.float64) for w in pdf["weights"]]
        )
        order = np.argsort(means, kind="stable")
        m, w = _compress(means[order], weights[order], compression)
        row = {
            "means": [m.tolist()],
            "weights": [w.tolist()],
            "vmin": [float(pdf["vmin"].min())],
            "vmax": [float(pdf["vmax"].max())],
        }
        if by:
            row[by] = [pdf[by].iloc[0]]
        return pd.DataFrame(row)

    if by:
        return partials.groupBy(by).applyInPandas(merge, schema=out_schema)
    return (
        partials.groupBy(F.lit(1).alias("__g"))
        .applyInPandas(lambda pdf: merge(pdf).assign(__g=1), schema="__g int, " + out_schema)
        .drop("__g")
    )
