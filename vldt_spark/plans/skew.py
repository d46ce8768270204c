"""B14 — skew mitigation: hot-key salting + AQE configuration.

The token table's ``source`` column is zipfian ("web" ≈ 70%,
FIXTURES.md F1): any groupBy/join on it puts 70% of rows on one reducer.
Two mitigations, composable:

  * salting: ``with_salt`` adds a deterministic salt column so hot keys
    spread over S reducers; aggregate (key, salt) partially, then key.
  * AQE: ``spark.sql.adaptive.skewJoin`` splits oversized join partitions
    at runtime — ``aqe_skew_conf`` returns the config dict to apply.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key: str, *, buckets: int = 32, salt_col: str = "__salt") -> DataFrame:
    """Salt column spreading equal-key rows over ``buckets`` reducers.

    The salt hashes the partition id + row position, so individual salt
    VALUES depend on the physical partition layout and are NOT stable
    across retries — what IS stable is every downstream RESULT: stage 2 of
    ``salted`` merges per key regardless of how rows were salted, so any
    layout yields the same final aggregate. (A truly layout-independent
    salt would need per-row content, which a generic key-only API doesn't
    have; rand() would be both layout- and schedule-dependent.)"""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.col(key), F.spark_partition_id(), F.monotonically_increasing_id()), F.lit(buckets)),
    )


def salted(
    df: DataFrame,
    key: str,
    aggs: list[tuple[str, str, str]],
    *,
    buckets: int = 32,
) -> DataFrame:
    """Two-stage salted aggregation for re-aggregable functions.

    ``aggs`` = [(fn, col, alias)] with fn in {count,sum,min,max}: stage 1
    aggregates per (key, salt) — bounded reducer load even when one key is
    70% of rows — stage 2 merges the ≤ buckets partials per key."""
    merge = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    s = with_salt(df, key, buckets=buckets)
    stage1 = s.groupBy(key, "__salt").agg(
        *[
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(c)).alias(f"__p_{alias}")
            for fn, c, alias in aggs
        ]
    )
    return stage1.groupBy(key).agg(
        *[
            getattr(F, merge[fn])(f"__p_{alias}").alias(alias)
            for fn, c, alias in aggs
        ]
    )


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Rebalance *before* CPU-bound per-row work when the scan has fewer
    splits than cores.

    Single-row-group parquet files (tiny dims, test fixtures) scan as ONE
    task, serializing everything downstream of them onto one core. A 100 TB
    table has ~10^5 row groups, so at cluster scale the partition-count
    guard makes this a no-op — no shuffle is ever added on a big input. In
    the sandbox it spreads a 1-split scan across all threads for the cost
    of shuffling a few MB (round-robin: no key, no skew)."""
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min_partitions:
        return df
    return df.repartition(min_partitions)


def aqe_skew_conf() -> dict[str, str]:
    """Config for runtime skew handling — apply at session build for every
    north-rule job (referenced by jobs/submit_validation.py)."""
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "3",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64MB",
    }


def key_skew_report(df: DataFrame, key: str) -> DataFrame:
    """Quantified skew diagnostic for a prospective groupBy/join key —
    the measurement that DECIDES the mitigations above (salt bucket count,
    whether AQE skew-join will fire) instead of guessing them.

    One row: (key_col, n_rows, n_keys, hot_key, hot_n, hot_share,
    skew_factor, recommended_buckets) where skew_factor = hot_n /
    (n_rows / n_keys) — how many × the average reducer load the hottest
    key carries — and recommended_buckets = ceil(skew_factor), the salt
    count that levels the hot reducer back to average.  hot_key tie-break:
    largest count, then lexicographically greatest key (deterministic).

    Scale shape: one hash aggregate per key (map-side partials), then a
    second aggregate over |keys| rows — the per-key relation never holds
    more than |distinct keys| rows, so this costs the same as any count-by
    and is safe to run on every candidate key of a 10^12-row table.  NULL
    keys are excluded (they hash to one reducer too, but every groupBy
    treats them as one ordinary group)."""
    per = (
        df.where(F.col(key).isNotNull())
        .groupBy(F.col(key).cast("string").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rep = per.agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("hot_n"),
        F.max_by(F.col("k"), F.struct(F.col("n"), F.col("k"))).alias("hot_key"),
    )
    avg = F.col("n_rows").cast("double") / F.col("n_keys").cast("double")
    factor = F.col("hot_n").cast("double") / avg
    return rep.select(
        F.lit(key).alias("key_col"),
        "n_rows",
        "n_keys",
        "hot_key",
        "hot_n",
        F.round(F.col("hot_n").cast("double") / F.col("n_rows").cast("double"), 6).alias(
            "hot_share"
        ),
        F.round(factor, 6).alias("skew_factor"),
        F.ceil(factor).cast("long").alias("recommended_buckets"),
    )
