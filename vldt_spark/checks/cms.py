"""Count-min sketch heavy hitters — the frequency analog of the t-digest.

``frequent_values`` (column_stats.py) is the exact top-k: a groupBy whose
shuffle carries |distinct| partials. That is the right plan when the
column's distinct count is bounded; when it is NOT (url-like columns,
raw token strings at 10^12 rows), the exact aggregate's hash table is
unbounded. The count-min sketch (Cormode & Muthukrishnan 2005) caps
memory at depth × width counters per partial, merges by plain matrix
addition (associative — the same persist-partials-then-merge composition
as ``merge_digests``), and guarantees estimate ≥ true count with
overshoot ≤ εN at probability 1−δ (width ≈ e/ε, depth ≈ ln 1/δ).

Spark-first plan (three bounded stages, raw values never shuffled):

1. fold — ``mapInPandas``: per Arrow batch, one ``xxhash64`` per value
   (JVM-side), positions via vectorized splitmix64 per sketch row,
   ``np.add.at`` accumulation, plus the batch's exact local top
   candidates carried WITH their hashes (a global heavy hitter is
   locally heavy in at least one batch; oversampled 4×). One bounded row
   per batch.
2. pre-merge — partial rows group by a salt into ≤16 buckets; each
   bucket sums its sketch matrices and unions candidates (dedup by
   value, capped by partial-estimate rank so candidate lists stay
   bounded even across millions of batches).
3. final merge — one reducer sums ≤16 matrices, estimates every
   candidate as the min over depth rows at its carried-hash positions,
   and emits the top-k (ties broken by value for determinism).

Exactness contract for the oracle: estimates only OVERSHOOT, and only
when a value collides in EVERY one of the ``depth`` rows; with
|distinct| ≪ width the odds are ≈ (|distinct|/width)^depth (~1e-8 on
the gate fixture) and hashing is deterministic — so the gate query pins
sketch top-k == exact top-k at all three scales, while the
guarantee-shaped behavior (never undercount; overshoot appears under a
deliberately tiny width) is pytest-asserted.

Reference parity note: roman-right/vldt has no sketch surface; this is
north-star territory (bounded-memory distributed profiling).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIAL_SCHEMA = (
    "salt int, sketch array<long>, cand_v array<string>, cand_h array<long>"
)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixing constants)."""
    mask = np.uint64(0xFFFFFFFFFFFFFFFF)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & mask
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & mask
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & mask
    return x ^ (x >> np.uint64(31))


def _positions(h64: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) position matrix from one base hash per value."""
    out = np.empty((depth, h64.size), dtype=np.int64)
    for d in range(depth):
        out[d] = (
            _splitmix64(h64 + np.uint64(d) * np.uint64(0x9E3779B9))
            % np.uint64(width)
        ).astype(np.int64)
    return out


def _estimate(sketch: np.ndarray, h: np.ndarray, depth: int, width: int) -> np.ndarray:
    pos = _positions(h, depth, width)
    return sketch[np.arange(depth)[:, None], pos].min(axis=0)


def cms_heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    *,
    width: int = 4096,
    depth: int = 4,
    candidate_factor: int = 4,
    merge_buckets: int = 16,
) -> DataFrame:
    """Top-``k`` values of ``col`` by count-min estimate: returns
    (value:string, est_count:long, rank:int), rank 1 = heaviest.

    Memory is depth×width counters per partial and per merge — never a
    |distinct|-sized hash table. Values are sketched by their canonical
    string form (the same width-normalization as the Bloom screen).
    """
    src = (
        df.select(F.col(col).cast("string").alias("__v"))
        .where(F.col("__v").isNotNull())
        .withColumn("__h", F.xxhash64("__v"))
    )
    n_cand = k * candidate_factor
    cand_cap = n_cand * 8  # per-bucket candidate bound through pre-merge

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rng_salt = None
        for pdf in batches:
            if pdf.empty:
                continue
            h = pdf["__h"].to_numpy(dtype=np.int64).astype(np.uint64)
            sketch = np.zeros((depth, width), dtype=np.int64)
            pos = _positions(h, depth, width)
            for d in range(depth):
                np.add.at(sketch[d], pos[d], 1)
            top = pdf.groupby("__v", sort=False)["__h"].agg(["count", "first"])
            top = top.sort_values("count", ascending=False).head(n_cand)
            if rng_salt is None:
                # deterministic per-batch salt from the batch's own hashes
                rng_salt = int(h[0] % np.uint64(merge_buckets))
            yield pd.DataFrame(
                {
                    "salt": [rng_salt],
                    "sketch": [sketch.ravel().tolist()],
                    "cand_v": [top.index.tolist()],
                    "cand_h": [top["first"].astype(np.int64).tolist()],
                }
            )
            rng_salt = (rng_salt + 1) % merge_buckets

    partials = src.mapInPandas(fold, schema=_PARTIAL_SCHEMA)

    def merge_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        sketch = np.zeros(depth * width, dtype=np.int64)
        cands: dict[str, int] = {}
        for s, vs, hs in zip(pdf["sketch"], pdf["cand_v"], pdf["cand_h"]):
            sketch += np.asarray(s, dtype=np.int64)
            for v, hh in zip(vs, hs):
                cands.setdefault(v, int(hh))
        sk = sketch.reshape(depth, width)
        if cands:
            vals = sorted(cands)
            h_signed = np.array([cands[v] for v in vals], dtype=np.int64)
            est = _estimate(sk, h_signed.astype(np.uint64), depth, width)
            keep = sorted(
                range(len(vals)), key=lambda i: (-int(est[i]), vals[i])
            )[:cand_cap]
            vals = [vals[i] for i in keep]
            hs_out = [int(h_signed[i]) for i in keep]
        else:
            vals, hs_out = [], []
        return pd.DataFrame(
            {
                "salt": [int(pdf["salt"].iloc[0])],
                "sketch": [sketch.tolist()],
                "cand_v": [vals],
                "cand_h": [hs_out],
            }
        )

    pre = partials.groupBy("salt").applyInPandas(merge_bucket, schema=_PARTIAL_SCHEMA)

    def merge_final(pdf: pd.DataFrame) -> pd.DataFrame:
        sketch = np.zeros(depth * width, dtype=np.int64)
        cands: dict[str, int] = {}
        for s, vs, hs in zip(pdf["sketch"], pdf["cand_v"], pdf["cand_h"]):
            sketch += np.asarray(s, dtype=np.int64)
            for v, hh in zip(vs, hs):
                cands.setdefault(v, int(hh))
        if not cands:
            return pd.DataFrame({"value": [], "est_count": [], "rank": []})
        sk = sketch.reshape(depth, width)
        vals = sorted(cands)
        h = np.array([cands[v] for v in vals], dtype=np.int64).astype(np.uint64)
        est = _estimate(sk, h, depth, width)
        order = sorted(range(len(vals)), key=lambda i: (-int(est[i]), vals[i]))[:k]
        return pd.DataFrame(
            {
                "value": [vals[i] for i in order],
                "est_count": [int(est[i]) for i in order],
                "rank": list(range(1, len(order) + 1)),
            }
        )

    out = (
        pre.groupBy(F.lit(1).alias("__g"))
        .applyInPandas(
            lambda pdf: merge_final(pdf).assign(__g=1),
            schema="__g int, value string, est_count long, rank int",
        )
        .drop("__g")
    )
    return out.orderBy("rank")
