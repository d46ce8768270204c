"""B5 — uniqueness at scale: salted two-stage hash aggregation.

Generalizes the reference's per-object identity (one ``Model`` instance ==
one record; vldt has no cross-record checks) to a table-wide primary-key
constraint over 10^12 rows.

Why two stages: a naive ``groupBy(key)`` shuffles every row on the key; a
pathologically hot key (or adversarial duplicates) lands on one reducer.
Stage 1 groups on ``(key, salt)`` where salt = pmod(xxhash64(entire-row
identity-ish), S) — partial counts per reducer stay ≤ ceil(n_key / S).
Stage 2 aggregates the (≤ S per key, usually 1) partials. Map-side partial
aggregation (Catalyst HashAggregate partial→final) makes stage 1 cheap; the
stage-2 input is **already tiny** (one row per (key,salt) with dupes only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(
    df: DataFrame, key: str | list[str], *, salt_buckets: int = 64
) -> DataFrame:
    """Keys occurring more than once → (key cols..., n_dups). Composite
    keys pass a list (the salted two-stage shape is identical — the salt
    hashes every key column). Rows with ANY null key column are excluded
    (nulls are not_null violations, not uniqueness ones)."""
    keys = [key] if isinstance(key, str) else list(key)
    nn = F.lit(True)
    for k in keys:
        nn = nn & F.col(k).isNotNull()
    salted = df.select(*keys).where(nn).withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(*[F.col(k) for k in keys], F.spark_partition_id()),
            F.lit(salt_buckets),
        ),
    )
    partial = salted.groupBy(*keys, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return (
        partial.groupBy(*keys)
        .agg(F.sum("__c").alias("n_dups"))
        .where(F.col("n_dups") > 1)
    )


def duplicate_rows(df: DataFrame, key: str, *, salt_buckets: int = 64) -> DataFrame:
    """All rows participating in a duplicate key — dup-key set broadcast back
    so the fact table is never shuffled."""
    dups = duplicate_keys(df, key, salt_buckets=salt_buckets)
    return df.join(F.broadcast(dups.select(key)), key, "left_semi")


def uniqueness_report(df: DataFrame, key: str) -> DataFrame:
    """One-row summary: total, distinct, duplicated keys, dup rows."""
    dups = duplicate_keys(df, key)
    agg = dups.agg(
        F.count(F.lit(1)).alias("n_dup_keys"),
        F.coalesce(F.sum("n_dups"), F.lit(0)).alias("n_dup_rows"),
    )
    totals = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(key).alias("n_nonnull"),
    )
    return totals.crossJoin(agg)
