"""Streaming quantiles: per-window t-digest in keyed state.

The continuous twin of ``checks/tdigest.tdigest_quantiles`` — completes
the batch/stream sketch symmetry (PSI, centroid drift, uniqueness, and
CMS heavy hitters all have streaming twins; quantiles were the gap).
State per event-time window is ONE digest (≤ ~compression centroids +
min/max), regardless of how many rows stream through — a windowed
``percentile_approx`` could compute the same number, but its state is
opaque JVM sketch internals, while this exposes the SAME fold/merge/
interpolate code path as the batch op, so batch and stream answers are
equal by construction (not merely approximately equal).

Each micro-batch merges its rows into the window's digest (sort +
vectorized k1-bucket compress — the digest merge law, raw values never
retained in state) and emits the window's CURRENT quantiles in update
mode; the last emission per window is the window's answer. Emission
rides updates rather than event-time timeouts for the same
``processAllAvailable`` reason documented in streaming/stateful.py and
cms_stream.py.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from vldt_spark.checks.tdigest import _compress, _quantiles

_OUT = T.StructType(
    [
        T.StructField("window_start", T.TimestampType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("p", T.DoubleType(), False),
        T.StructField("q", T.DoubleType(), False),
    ]
)

_STATE = T.StructType(
    [
        T.StructField("means", T.ArrayType(T.DoubleType()), False),
        T.StructField("weights", T.ArrayType(T.DoubleType()), False),
        T.StructField("vmin", T.DoubleType(), False),
        T.StructField("vmax", T.DoubleType(), False),
    ]
)


def _make_folder(probs: Sequence[float], compression: int):
    def fold(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:  # pragma: no cover - eviction path
            state.remove()
            return
        if state.exists:
            means_l, weights_l, vmin, vmax = state.get
            means = np.asarray(means_l, dtype=np.float64)
            weights = np.asarray(weights_l, dtype=np.float64)
        else:
            means = np.empty(0, dtype=np.float64)
            weights = np.empty(0, dtype=np.float64)
            vmin, vmax = np.inf, -np.inf
        for pdf in pdfs:
            if pdf.empty:
                continue
            v = pdf["__v"].to_numpy(dtype=np.float64)
            v = v[~np.isnan(v)]
            if v.size == 0:
                continue
            vmin = min(vmin, float(v.min()))
            vmax = max(vmax, float(v.max()))
            means = np.concatenate([means, v])
            weights = np.concatenate([weights, np.ones(v.size)])
            order = np.argsort(means, kind="stable")
            means, weights = _compress(means[order], weights[order], compression)
        n = float(weights.sum())
        if n == 0:
            return
        state.update((means.tolist(), weights.tolist(), float(vmin), float(vmax)))
        qs = _quantiles(means, weights, float(vmin), float(vmax), list(probs))
        yield pd.DataFrame(
            {
                "window_start": [key[0]] * len(probs),
                "n_rows": [int(n)] * len(probs),
                "p": list(probs),
                "q": qs,
            }
        )

    return fold


def stream_tdigest_quantiles(
    stream_df: DataFrame,
    value_col: str,
    ts_col: str,
    *,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    compression: int = 200,
    window: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-event-time-window t-digest quantiles over a stream: emits
    (window_start, n_rows, p, q) in UPDATE mode — the latest emission per
    window is the window's answer. While a window holds ≤ compression
    points, the digest stays in its singleton-exact regime and q equals
    the exact order-statistic quantile (same contract as the batch op)."""
    probs = [float(p) for p in probs]
    keyed = (
        stream_df.withWatermark(ts_col, watermark)
        .select(
            F.window(F.col(ts_col), window).getField("start").alias("__w"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .where(F.col("__v").isNotNull())
    )
    return keyed.groupBy("__w").applyInPandasWithState(
        _make_folder(probs, compression),
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
