"""Quarantine sink: route validated data, never drop it silently.

The standard shape for a validation stage inside a larger pipeline
(write-audit-publish): valid rows land in the main table, invalid rows
land — WITH their violation lineage and original values — in a quarantine
area keyed by the same partition column, so they can be inspected,
re-processed after a fix, and reconciled (main + quarantine row counts sum
to the input, which `reconcile` asserts).

One pass over the annotated DataFrame feeds both sinks; at 100 TB the
annotated plan is persisted once (StorageLevel DISK_ONLY if memory-tight)
so validation is not recomputed per sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vldt_spark.engine import ValidationResult


def write_quarantined(
    res: ValidationResult,
    root: str,
    *,
    partition_col: str | None = None,
    persist: bool = True,
) -> dict:
    """Write ``<root>/data`` (valid rows, canonical columns) and
    ``<root>/quarantine`` (invalid rows + ``violations`` serialized to a
    JSON string column). Returns {"n_valid": ..., "n_quarantined": ...}."""
    ann = res.annotated
    if persist:
        ann = ann.persist()
    try:
        valid = ann.filter(F.col("is_valid")).drop("violations", "is_valid")
        invalid = ann.filter(~F.col("is_valid")).drop("is_valid").withColumn(
            "violations_json", F.to_json(F.col("violations"))
        ).drop("violations")

        vw = valid.write.mode("overwrite")
        qw = invalid.write.mode("overwrite")
        if partition_col is not None:
            vw = vw.partitionBy(partition_col)
            qw = qw.partitionBy(partition_col)
        vw.parquet(os.path.join(root, "data"))
        qw.parquet(os.path.join(root, "quarantine"))
        spark = ann.sparkSession
        n_valid = spark.read.parquet(os.path.join(root, "data")).count()
        n_quar = spark.read.parquet(os.path.join(root, "quarantine")).count()
        return {"n_valid": n_valid, "n_quarantined": n_quar}
    finally:
        if persist:
            ann.unpersist()


def reconcile(spark: SparkSession, root: str, n_input: int) -> bool:
    """Audit step: every input row landed in exactly one sink."""
    n_valid = spark.read.parquet(os.path.join(root, "data")).count()
    n_quar = spark.read.parquet(os.path.join(root, "quarantine")).count()
    return n_valid + n_quar == n_input
