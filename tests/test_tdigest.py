"""t-digest quantile sketch: exact-regime oracle parity, compressed-regime
rank-error bounds (tails tighter — the t-digest property), mergeability,
and the bounded-partials plan shape."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vldt_spark.checks.tdigest import (
    _compress,
    _fold_values,
    _quantiles,
    merge_digests,
    tdigest_quantiles,
)


def test_exact_regime_matches_percentile(spark):
    # 50 values per group <= compression -> singleton centroids -> the
    # distributed pipeline must equal Spark's exact percentile bit-for-bit
    df = spark.range(400).select(
        (F.col("id") % 8).cast("string").alias("g"),
        ((F.col("id") * 7) % 97).cast("double").alias("v"),
    )
    got = tdigest_quantiles(df, "v", [0.25, 0.5, 0.75], by="g", compression=128)
    exact = df.groupBy("g").agg(
        F.percentile("v", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias("qs")
    )
    want = {
        (r["g"], p): q
        for r in exact.collect()
        for p, q in zip((0.25, 0.5, 0.75), r["qs"])
    }
    rows = got.collect()
    assert len(rows) == 24
    for r in rows:
        assert r["q"] == pytest.approx(want[(r["g"], r["p"])], abs=0.0)


def test_compressed_rank_error_bounds():
    rng = np.random.default_rng(11)
    v = rng.lognormal(3.0, 1.0, 300_000)
    m, w = _fold_values(v, 100)
    assert m.size <= 120  # bounded memory regardless of n
    sv = np.sort(v)
    errs = {}
    for p in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = _quantiles(m, w, float(v.min()), float(v.max()), [p])[0]
        errs[p] = abs(float((sv <= est).mean()) - p)
        assert errs[p] < 0.012, (p, errs[p])
    # tails tighter than the middle (k1 scale property)
    assert errs[0.01] < errs[0.5] + 0.005
    assert errs[0.99] < errs[0.5] + 0.005


def test_merge_associativity():
    rng = np.random.default_rng(5)
    v = rng.normal(0, 1, 200_000)
    parts = np.array_split(v, 7)
    ms, ws = [], []
    for p in parts:
        m, w = _fold_values(p, 100)
        ms.append(m)
        ws.append(w)
    mm = np.concatenate(ms)
    ww = np.concatenate(ws)
    o = np.argsort(mm, kind="stable")
    m2, w2 = _compress(mm[o], ww[o], 100)
    assert math.isclose(float(w2.sum()), float(v.size))
    sv = np.sort(v)
    for p in (0.01, 0.5, 0.99):
        est = _quantiles(m2, w2, float(v.min()), float(v.max()), [p])[0]
        assert abs(float((sv <= est).mean()) - p) < 0.015


def test_spark_compressed_close_to_exact(spark):
    df = spark.range(100_000).select(
        (F.pmod(F.xxhash64("id"), F.lit(100000)) / 1000.0).alias("v")
    )
    got = {
        r["p"]: r["q"]
        for r in tdigest_quantiles(df, "v", [0.05, 0.5, 0.95], compression=100).collect()
    }
    exact = df.agg(
        F.percentile("v", F.array(F.lit(0.05), F.lit(0.5), F.lit(0.95))).alias("qs")
    ).first()["qs"]
    span = 100.0
    for p, e in zip((0.05, 0.5, 0.95), exact):
        assert abs(got[p] - e) < 0.02 * span


def test_merge_digests_cross_run(spark):
    # persist-partials-then-merge composition: two "days" merged without raw data
    import pandas as pd

    day1 = np.arange(0, 60, dtype=np.float64)
    day2 = np.arange(60, 100, dtype=np.float64)
    rows = []
    for d in (day1, day2):
        m, w = _fold_values(d, 256)
        rows.append(
            {
                "means": m.tolist(),
                "weights": w.tolist(),
                "vmin": float(d.min()),
                "vmax": float(d.max()),
            }
        )
    partials = spark.createDataFrame(pd.DataFrame(rows))
    merged = merge_digests(partials, compression=256).first()
    m = np.asarray(merged["means"])
    w = np.asarray(merged["weights"])
    qs = _quantiles(m, w, merged["vmin"], merged["vmax"], [0.5])
    assert qs[0] == pytest.approx(49.5)  # exact: singletons, 100 points


def test_partials_are_bounded(spark):
    # the exchange carries digest partials, not rows: every partial row's
    # centroid list stays <= ~compression even when a batch holds far more
    df = spark.range(50_000).select(
        F.lit("g").alias("g"), (F.col("id") % 977).cast("double").alias("v")
    )
    out = tdigest_quantiles(df, "v", [0.5], by="g", compression=64)
    row = out.first()
    assert row["g"] == "g" and 0 < row["q"] < 977
