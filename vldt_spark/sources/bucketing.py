"""Bucketed-table support: co-located joins without a shuffle.

At 100 TB the repeated cost in a validation pipeline is joining fact
tables on the same key over and over (token table ↔ reference table for
the B8 equality invariant, fact ↔ per-key verdict history). Writing both
sides bucketed by that key (`bucketBy(n, key)`, same n both sides) makes
every subsequent equi-join on it shuffle-free: Catalyst recognizes the
matching output partitioning and plans SortMergeJoin with NO Exchange on
either side — the join cost collapses to a per-bucket local merge.

This is the persisted analogue of `repartition(key)`: pay the shuffle once
at write time, amortize it over every downstream join/aggregation on the
key. On a real deployment the same layout maps to Iceberg's bucket
partition transform (`bucket(n, key)`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str,
    buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and sorted) by ``key`` as a saved table —
    bucketing metadata lives in the catalog, so it must go through
    ``saveAsTable`` (a plain parquet write loses the layout)."""
    w = df.write.mode(mode).bucketBy(buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def cohort_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts Catalyst plans this WITHOUT any Exchange (assert it with
    ``.explain()``); with mismatched counts it falls back to a normal
    shuffle join — correctness never depends on the layout."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
