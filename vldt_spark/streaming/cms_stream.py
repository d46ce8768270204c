"""Streaming heavy hitters: per-window count-min sketch in keyed state.

The continuous twin of ``checks/cms.cms_heavy_hitters``. A windowed
``groupBy(value)`` would keep |distinct values| state per window — the
exact failure mode CMS exists to avoid; here the state per WINDOW is one
depth×width sketch matrix plus a capped candidate list, regardless of how
many distinct values stream through.

Mechanics: rows are keyed by their event-time window start;
``applyInPandasWithState`` folds each micro-batch's values into the
window's sketch (the same vectorized ``np.add.at`` fold as batch CMS —
the state is literally a mergeable CMS partial), and each update emits
the window's CURRENT top-k (output mode "update"; downstream keeps the
latest row set per window — the last update after the window stops
receiving data is exactly the batch answer). An optional event-time
timeout evicts state once the watermark passes the window end, bounding
state to windows in flight. Emission rides updates rather than timeouts
because timeout-triggered batches don't quiesce under the synchronous
``processAllAvailable`` test path (same constraint documented in
streaming/stateful.py).

Batch/stream consistency: the fold and estimate code is IMPORTED from
checks/cms (one implementation), so a window that received all its data
in one run emits exactly what ``cms_heavy_hitters`` computes on the same
rows — pinned by the oracle gate query.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from vldt_spark.checks.cms import _estimate, _positions

_OUT = T.StructType(
    [
        T.StructField("window_start", T.TimestampType(), False),
        T.StructField("value", T.StringType(), False),
        T.StructField("est_count", T.LongType(), False),
        T.StructField("rank", T.IntegerType(), False),
    ]
)

_STATE = T.StructType(
    [
        T.StructField("sketch", T.ArrayType(T.LongType()), False),
        T.StructField("cand_v", T.ArrayType(T.StringType()), False),
        T.StructField("cand_h", T.ArrayType(T.LongType()), False),
    ]
)


def _duration_ms(spec: str) -> int:
    """Parse the Spark window-duration subset we accept ('1 day',
    '30 minutes', '10 seconds', ...) into milliseconds."""
    import re

    units = {
        "millisecond": 1,
        "second": 1_000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
        "week": 604_800_000,
    }
    m = re.fullmatch(r"\s*(\d+)\s+([a-z]+?)s?\s*", spec.lower())
    if not m or m.group(2) not in units:
        raise ValueError(f"unsupported window duration: {spec!r}")
    return int(m.group(1)) * units[m.group(2)]


def _make_folder(
    k: int, width: int, depth: int, cand_cap: int, ttl: bool, window_ms: int
):
    def fold(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            sk_flat, cand_v, cand_h = state.get
            sketch = np.asarray(sk_flat, dtype=np.int64).reshape(depth, width)
            cands = dict(zip(cand_v, (int(x) for x in cand_h)))
        else:
            sketch = np.zeros((depth, width), dtype=np.int64)
            cands = {}
        for pdf in pdfs:
            if pdf.empty:
                continue
            h = pdf["__h"].to_numpy(dtype=np.int64).astype(np.uint64)
            pos = _positions(h, depth, width)
            for d in range(depth):
                np.add.at(sketch[d], pos[d], 1)
            for v, hh in zip(pdf["__v"], pdf["__h"]):
                cands.setdefault(v, int(hh))
        if cands:
            vals = sorted(cands)
            h_signed = np.array([cands[v] for v in vals], dtype=np.int64)
            est = _estimate(sketch, h_signed.astype(np.uint64), depth, width)
            keep = sorted(
                range(len(vals)), key=lambda i: (-int(est[i]), vals[i])
            )[:cand_cap]
            cands = {vals[i]: int(h_signed[i]) for i in keep}
            top = keep[:k]
        else:
            top = []
            vals, est = [], np.array([])
        state.update(
            (
                sketch.ravel().tolist(),
                list(cands.keys()),
                [cands[v] for v in cands],
            )
        )
        if ttl:
            # evict once the watermark passes the WINDOW END (computed
            # from the key = window start + duration): rows for this
            # window carry event times < window end, so once the
            # watermark clears it nothing more can legally arrive —
            # evicting any earlier (e.g. at watermark+1) would drop a
            # live window's sketch between micro-batches and restart its
            # counts from zero. EventTimeTimeout requires a timestamp
            # strictly ahead of the current watermark, hence the clamp.
            end_ms = int(key[0].timestamp() * 1000) + window_ms
            state.setTimeoutTimestamp(
                max(end_ms, state.getCurrentWatermarkMs() + 1)
            )
        if top:
            yield pd.DataFrame(
                {
                    "window_start": [key[0]] * len(top),
                    "value": [vals[i] for i in top],
                    "est_count": [int(est[i]) for i in top],
                    "rank": list(range(1, len(top) + 1)),
                }
            )

    return fold


def stream_heavy_hitters(
    stream_df: DataFrame,
    value_col: str,
    ts_col: str,
    *,
    k: int = 10,
    width: int = 1024,
    depth: int = 3,
    candidate_factor: int = 4,
    window: str = "1 day",
    watermark: str = "1 hour",
    evict_on_watermark: bool = False,
) -> DataFrame:
    """Per-event-time-window heavy hitters over a stream: emits
    (window_start, value, est_count, rank) in UPDATE mode — the latest
    emission per window is the window's answer, identical to the batch
    ``cms_heavy_hitters`` over the same rows when |distinct| ≪ width.

    State per window: depth×width int64 + ≤ k·candidate_factor·8
    candidates. ``evict_on_watermark`` adds event-time eviction (needs a
    real trigger cadence; leave off under synchronous test drivers)."""
    keyed = (
        stream_df.withWatermark(ts_col, watermark)
        .select(
            F.window(F.col(ts_col), window).getField("start").alias("__w"),
            F.col(value_col).cast("string").alias("__v"),
        )
        .where(F.col("__v").isNotNull())
        .withColumn("__h", F.xxhash64("__v"))
    )
    fold = _make_folder(
        k,
        width,
        depth,
        k * candidate_factor * 8,
        evict_on_watermark,
        _duration_ms(window),
    )
    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if evict_on_watermark
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("__w").applyInPandasWithState(
        fold,
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=timeout,
    )
